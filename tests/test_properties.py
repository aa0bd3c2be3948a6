"""Property-based tests (hypothesis) for the SURVEY §6 invariants:
IRI-safe percent-encoding ≡ RFC 3986 (urllib ground truth), and
MinHash/dedup set-semantics invariance under row order + duplicates.

Each property batches all generated examples through ONE Spark job
(hypothesis drives the data, not the job count)."""

from __future__ import annotations

import os
import sys
import urllib.parse

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from r2rml_parser_spark.functions.encoding import iri_safe_encode  # noqa: E402
from r2rml_parser_spark.operators.dedup import (  # noqa: E402
    exact_dedup,
    minhash_band_buckets,
)

# printable-ish unicode incl. reserved URI chars, spaces, non-ASCII
TEXTS = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), min_codepoint=1),
    max_size=40,
)


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=40))
def test_iri_safe_encode_matches_rfc3986_quote(spark, strings):
    df = spark.createDataFrame([(s,) for s in strings], ["s"]).coalesce(1)
    got = [r.e for r in df.select(iri_safe_encode(F.col("s")).alias("e")).collect()]
    want = [urllib.parse.quote(s, safe="") for s in strings]
    assert got == want


WORDS = st.text(alphabet="abcdefg hij", min_size=0, max_size=60)


@settings(max_examples=5, deadline=None)
@given(st.lists(WORDS, min_size=1, max_size=25), st.randoms())
def test_minhash_signature_invariant_under_order_and_duplicates(spark, texts, rnd):
    rows = [(i, t) for i, t in enumerate(texts)]
    # duplicate a random subset of rows and shuffle — signatures are
    # per-doc set functions, so bands must be identical
    noisy = rows + [rows[rnd.randrange(len(rows))] for _ in range(3)]
    rnd.shuffle(noisy)
    a = spark.createDataFrame(rows, ["doc_id", "text"])
    b = spark.createDataFrame(noisy, ["doc_id", "text"]).dropDuplicates()
    for fam in ("md5", "xxhash64"):
        ba = {tuple(r) for r in minhash_band_buckets(a, hash_family=fam).collect()}
        bb = {tuple(r) for r in minhash_band_buckets(b, hash_family=fam).collect()}
        assert ba == bb, fam


@settings(max_examples=5, deadline=None)
@given(st.lists(WORDS, min_size=1, max_size=25), st.randoms())
def test_exact_dedup_counts_duplicates_regardless_of_order(spark, texts, rnd):
    rows = [(i, t) for i, t in enumerate(texts)]
    dup_ids = [rnd.randrange(len(rows)) for _ in range(3)]
    noisy = rows + [(1000 + k, rows[i][1]) for k, i in enumerate(dup_ids)]
    rnd.shuffle(noisy)
    got = {r.keep_id: r.n_dups for r in exact_dedup(
        spark.createDataFrame(noisy, ["doc_id", "text"])).collect()}
    # every text's group count equals its multiplicity; keep_id is the min id
    from collections import Counter

    norm = lambda t: " ".join(t.lower().split())  # noqa: E731
    mult = Counter(norm(t) for _, t in noisy)
    ids = {}
    for i, t in noisy:
        ids.setdefault(norm(t), []).append(i)
    assert got == {min(v): mult[k] for k, v in ids.items()}
