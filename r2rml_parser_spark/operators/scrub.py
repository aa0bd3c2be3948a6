"""PII scrubbing: single-scan regex redaction with per-kind counts.

The training-data-pipeline hygiene stage (CCNet/Dolma-style pipelines
run exactly this before anything else touches the text): replace
email addresses, IPv4 addresses, and phone numbers with placeholder
tokens and report how many of each were redacted per document, so
downstream quality filters can threshold on PII density.

Spark-first shape: ONE projection over the scan — three
``regexp_count`` + three chained ``regexp_replace`` column expressions,
all whole-stage-codegen JVM-side, no shuffle, no UDF. At 100 TB this
is scan-bound by construction; the counts are in-row so no aggregation
exchange exists unless the caller adds one.

Pattern notes: the defaults avoid constructs that differ between
regex engines (no lookaround, no backreferences), so the DuckDB
oracle (RE2) replays Spark's (Java regex) behavior exactly — that is
what the ``scrub_pii`` driver query pins. They are deliberately
conservative (precision over recall): an email-ish token, a dotted
quad with 1-3 digit octets, and an international-ish ``+D[-D]``
phone shape. Callers with a domain-specific PII inventory pass their
own ``patterns`` mapping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default (placeholder, regex) per PII kind — engine-portable subset
#: (identical semantics under Java regex and RE2)
DEFAULT_PATTERNS: dict[str, tuple[str, str]] = {
    "email": ("<EMAIL>", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    "phone": ("<PHONE>", r"\+\d{1,2}-\d{3}-\d{4}"),
    "ipv4": ("<IP>", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
}


def scrub_pii(
    docs: DataFrame,
    text_col: str = "text",
    patterns: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Redact PII from ``text_col``, adding one ``n_<kind>`` count
    column per pattern kind. All other columns pass through; the
    scrubbed text replaces ``text_col``.

    Replacement order is the mapping's iteration order — earlier kinds
    are redacted (and counted) first, so an email is never also
    counted as a phone fragment.
    """
    pats = patterns or DEFAULT_PATTERNS
    out = docs
    col = F.col(text_col)
    counts = []
    for kind, (placeholder, rx) in pats.items():
        counts.append(F.regexp_count(col, F.lit(rx)).alias(f"n_{kind}"))
        col = F.regexp_replace(col, rx, placeholder)
    keep = [F.col(c) for c in docs.columns if c != text_col]
    return out.select(
        *keep, col.alias(text_col), *counts
    )
