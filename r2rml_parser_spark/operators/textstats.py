"""Text analysis operators: language-ID, quality scoring, token
counting, document fingerprinting.

Training-data-pipeline stages over the documents table; all pure
Catalyst expressions (integer counts preferred over ratios so the
DuckDB oracle hash-matches exactly; ratios are emitted as
round(x, 6) doubles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: deterministic marker-word table for the n-gram/stopword language
#: heuristic. The synthetic corpus shares one vocabulary, so markers
#: double as a *generic* heuristic demonstration: real corpora swap in
#: real stopword lists.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "y", "es"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "de", "et", "est"),
    "zh": ("的", "是", "了", "在", "和"),
}

STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")


def _tokens(col: Column) -> Column:
    return F.split(F.lower(F.trim(col)), " ")


def token_count(col: Column) -> Column:
    """Whitespace token count (0 for empty/blank text)."""
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(F.size(_tokens(col)))


def bpe_ish_token_count(col: Column) -> Column:
    """A BPE-ish proxy: count of regex word pieces (runs of letters,
    digits, or single punctuation) — deterministic, language-agnostic."""
    return F.size(F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def quality_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features: char/token/stopword/punct counts plus a
    [0,1] quality score (longer docs with stopword presence score higher)."""
    t = F.col(text_col)
    toks = _tokens(t)
    n_tokens = token_count(t)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), 0))
    mean_tok_len = F.when(n_tokens > 0, F.round(F.length(F.regexp_replace(t, " ", "")) / n_tokens, 6)).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, F.round(n_stop / n_tokens, 6)).otherwise(F.lit(0.0))
    return docs.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        n_punct.alias("n_punct"),
        mean_tok_len.alias("mean_token_len"),
        stop_ratio.alias("stopword_ratio"),
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language guess: per language, count marker hits in the
    token array (in-row); argmax with deterministic code tiebreak."""
    toks = _tokens(F.col(text_col))
    scores = [
        F.struct(
            F.size(F.filter(toks, lambda x: x.isin(*markers))).alias("hits"),
            F.lit(code).alias("code"),
        )
        for code, markers in sorted(LANG_MARKERS.items())
    ]
    # argmax by (hits, reversed-code) → array_max picks highest hits,
    # ties broken by code descending; unknown when zero hits.
    best = F.array_max(F.array(*scores))
    return docs.select(
        F.col(id_col),
        F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("und")).alias("lang_guess"),
        best["hits"].alias("marker_hits"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: md5 of normalized text (content identity)
    plus a rolling polynomial token hash (order-sensitive, mod 2^61-1)
    computed as an in-row fold — the distributed replacement for the
    reference's order-sensitive cumulative result-set MD5
    (UtilImpl.java:364-393, SURVEY.md §3.5 F5)."""
    t = F.col(text_col)
    norm = F.lower(F.trim(F.regexp_replace(t, r"\s+", " ")))
    toks = F.split(norm, " ")
    # modulus small enough that acc*31 never overflows int64 (matters for
    # the DuckDB oracle doing the identical fold in int64)
    mod = F.lit(1_000_000_007)
    rolling = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + F.ascii(x) + F.length(x)) % mod,
    )
    return docs.select(
        F.col(id_col),
        F.md5(norm).alias("content_md5"),
        rolling.alias("rolling_hash"),
    )


def gopher_rules(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition/quality signals (Rae et al. 2021, §A1.1 —
    public paper; the rules large-scale training pipelines filter on):

      * unique_token_ratio  — lexical diversity; low ⇒ repetitive doc
      * symbol_word_ratio   — '#'/'…' symbols per token
      * bullet_line_frac    — fraction of lines starting with a bullet
      * ellipsis_line_frac  — fraction of lines ending with '...' or '…'
      * mean_word_len       — mean alpha-token length

    All in-row whole-stage-codegen expressions over one scan; the DuckDB
    twin (oracles.gopher_rules_sql) reproduces every value bit-for-bit
    after round(6)."""
    toks = _tokens(F.col(text_col))
    n_tok = token_count(F.col(text_col))
    n_uniq = F.when(n_tok == 0, F.lit(0)).otherwise(F.size(F.array_distinct(toks)))
    n_sym = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[#…]|\.\.\."), 0))
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(lines, lambda ln: F.trim(ln).rlike(r"^([-*•])")))
    n_ellip = F.size(F.filter(lines, lambda ln: F.trim(ln).rlike(r"(\.\.\.|…)$")))
    alpha_lens = F.transform(
        F.filter(toks, lambda t: t.rlike(r"^[a-z]+$")), lambda t: F.length(t)
    )
    n_alpha = F.size(alpha_lens)
    sum_alpha = F.aggregate(alpha_lens, F.lit(0), lambda a, x: a + x)
    r6 = lambda c: F.round(c, 6)  # noqa: E731
    return docs.select(
        F.col(id_col),
        r6(F.when(n_tok > 0, n_uniq / n_tok).otherwise(F.lit(0.0))).alias("unique_token_ratio"),
        r6(F.when(n_tok > 0, n_sym / n_tok).otherwise(F.lit(0.0))).alias("symbol_word_ratio"),
        r6(F.when(n_lines > 0, n_bullet / n_lines).otherwise(F.lit(0.0))).alias("bullet_line_frac"),
        r6(F.when(n_lines > 0, n_ellip / n_lines).otherwise(F.lit(0.0))).alias("ellipsis_line_frac"),
        r6(F.when(n_alpha > 0, sum_alpha / n_alpha).otherwise(F.lit(0.0))).alias("mean_word_len"),
    )


def repetition_signals(
    docs: DataFrame, n: int = 2, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Intra-document n-gram repetition signals (the Gopher §A1.1
    duplicate/top n-gram filters, Rae et al. 2021 — public paper):

      * dup_gram_frac — fraction of word-n-gram INSTANCES that are
        repeats of an earlier instance in the same doc
        ((count − distinct) / count); high ⇒ loops, spam, boilerplate
        paragraphs repeated inside one page
      * top_gram_frac — fraction of gram instances taken by the single
        most frequent n-gram (max run over the sorted gram array);
        high ⇒ one phrase dominates the doc

    Complements the corpus-level operators: exact/MinHash dedup and
    ``strip_boilerplate`` act ACROSS documents, these act WITHIN one.

    Scale shape: everything is in-row over one scan — zero shuffle.
    The max-frequency count deliberately avoids explode + groupBy(doc,
    gram) (a corpus-sized shuffle of every token window): the gram
    array is sorted in-row and the longest equal-run is found by one
    fold. The fold lambdas are CodegenFallback (higher-order
    functions), but they stay JVM-side and the no-shuffle shape wins
    at 100 TB — this is a per-doc quality signal, not the KG hot path.

    Docs with fewer than ``n`` tokens have no gram and are dropped
    (matching the oracle's ``len(t) >= n`` gate).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = _tokens(F.col(text_col))
    n_tok = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), n_tok - n + 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    n_grams = F.size(grams)
    n_distinct = F.size(F.array_distinct(grams))
    # longest equal-run over the sorted array = max gram frequency
    sorted_g = F.array_sort(grams)
    top = F.aggregate(
        sorted_g,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                a["best"],
                F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda a: a["best"],
    )
    r6 = lambda c: F.round(c, 6)  # noqa: E731
    return (
        docs.where(n_tok >= n)
        .select(
            F.col(id_col),
            r6((n_grams - n_distinct) / n_grams).alias("dup_gram_frac"),
            r6(top / n_grams).alias("top_gram_frac"),
        )
    )
