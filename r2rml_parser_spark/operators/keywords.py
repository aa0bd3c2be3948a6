"""TF-IDF keyword extraction per document — corpus-global statistics.

Training-data curation building block (no reference counterpart —
r2rml-parser has no corpus operators): the top-k characteristic terms
of each document, scored tf × smoothed-idf against the whole corpus.
Used for topical sampling weights, domain tagging, and cheap
retrieval keys.

Scale shape (the corpus is 100 TB, the vocabulary is not):

* one explode pass tokenizes (lowercased alphabetic runs, ≥2 chars);
* ``tf`` is one groupBy over (doc, token) with map-side partial
  aggregation — the only corpus-sized shuffle;
* the document-frequency table derives from ``tf`` (vocabulary-sized,
  one more shuffle over the already-collapsed relation) and joins
  back token-keyed; the corpus-size scalar rides along as a one-row
  broadcast cross join, never a driver ``collect()``;
* top-k is a per-document window over the doc's own tokens — bounded
  groups, no global sort.

Determinism / oracle: the score is ``round(tf * (ln((N+1)/(df+1)) +
1), 6)`` and the window orders by the ROUNDED score then token, so
the DuckDB twin (same expressions, same window) reproduces rows
bit-for-bit; ties in rounded score break on the token string. The
6-digit rounding is the repo's established rounded-doubles oracle
practice (`oracles.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: lowercased alphabetic runs of at least two letters
TOKEN_RE = r"[a-z]{2,}"


def doc_tokens(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc, token) bag — one row per token occurrence."""
    return docs.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).alias("token"),
    )


def tfidf_keywords(
    docs: DataFrame,
    k: int = 3,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` (doc, token, score) rows per document by tf × idf
    (smoothed: ln((N+1)/(df+1)) + 1, so corpus-universal tokens still
    score positively and the log argument never touches zero)."""
    tf = (
        doc_tokens(docs, text_col=text_col, id_col=id_col)
        .groupBy("doc", "token")
        .agg(F.count("*").alias("tf"))
        # tf feeds BOTH the df table and the scored join: materialize
        # the collapsed relation so the corpus-sized tokenize+shuffle
        # runs once, not once per consumer (the plan shows no
        # ReusedExchange without it — 2 corpus scans at 100 TB).
        # localCheckpoint instead of persist() (r5 ADVICE): checkpoint
        # blocks are freed by the ContextCleaner when this frame is
        # GC'd, so repeated calls in a long-lived session don't
        # accumulate cached corpus slices the way an un-unpersisted
        # cache does — same lifecycle the closure/pagerank/pipeline
        # operators use.
        .localCheckpoint(eager=True)
    )
    n_docs = docs.agg(F.count("*").alias("n"))
    df_tbl = tf.groupBy("token").agg(F.count("*").alias("df"))
    scored = (
        tf.join(df_tbl, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc",
            "token",
            F.round(
                F.col("tf")
                * (F.log((F.col("n") + 1) / (F.col("df") + 1)) + 1),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc").orderBy(
        F.col("score").desc(), F.col("token")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def tfidf_keywords_oracle_sql(k: int = 3, table: str = "documents") -> str:
    """DuckDB twin replaying the same tokenization, smoothing,
    rounding, and window order."""
    return f"""
WITH toks AS (
  SELECT doc_id AS doc,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS token
  FROM {table}
),
tf AS (SELECT doc, token, COUNT(*) AS tf FROM toks GROUP BY doc, token),
nd AS (SELECT COUNT(*) AS n FROM {table}),
dftbl AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
scored AS (
  SELECT tf.doc, tf.token,
         round(tf.tf * (ln((nd.n + 1) / (dftbl.df + 1)) + 1), 6) AS score
  FROM tf JOIN dftbl USING (token) CROSS JOIN nd
)
SELECT doc, token, score FROM (
  SELECT scored.*,
         row_number() OVER (PARTITION BY doc ORDER BY score DESC, token) AS rn
  FROM scored
) WHERE rn <= {k}
"""


def token_frequencies(
    docs: DataFrame,
    k: int = 50,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus vocabulary head: top-``k`` tokens by total occurrence
    count with document frequency — the table stopword lists, Zipf
    sanity checks, and dataset cards are built from. One corpus-sized
    shuffle (two-phase count per token over the (doc, token) collapse),
    deterministic (count desc, token asc) head."""
    per_doc = (
        doc_tokens(docs, text_col=text_col, id_col=id_col)
        .groupBy("doc", "token")
        .agg(F.count("*").alias("tf"))
    )
    totals = per_doc.groupBy("token").agg(
        F.sum("tf").alias("n_occurrences"),
        F.count("*").alias("n_docs"),
    )
    return (
        totals.orderBy(F.col("n_occurrences").desc(), F.col("token"))
        .limit(k)
    )


def token_frequencies_oracle_sql(k: int = 50, table: str = "documents") -> str:
    return f"""
WITH toks AS (
  SELECT doc_id AS doc,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS token
  FROM {table}
),
per_doc AS (SELECT doc, token, COUNT(*) AS tf FROM toks GROUP BY doc, token)
SELECT token, SUM(tf) AS n_occurrences, COUNT(*) AS n_docs
FROM per_doc GROUP BY token
ORDER BY n_occurrences DESC, token LIMIT {k}
"""
