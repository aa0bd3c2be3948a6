"""IRI-safe percent-encoding — JVM-side, no Python UDF in the hot path.

The reference form-encodes with ``java.net.URLEncoder`` (space → ``+``,
``~`` → ``%7E``, ``*`` kept; UtilImpl.java:83-121, knob
``jena.encodeURLs``). The W3C R2RML spec — and this engine's goldens
(D020 ``Emily%20Smith``, ``http%3A%2F%2F...``) — require *IRI-safe*
percent-encoding instead: every char outside unreserved
(ALPHA / DIGIT / ``-._~``) becomes ``%XX`` (uppercase hex), space →
``%20``.

We get that from Spark's built-in ``url_encode`` (which mirrors Java
URLEncoder) plus three constant fix-ups, keeping the whole expression in
whole-stage codegen instead of dropping to a pandas UDF:
  ``+`` → ``%20``   (form → percent space)
  ``*`` → ``%2A``   (URLEncoder leaves ``*`` bare)
  ``%7E`` → ``~``   (URLEncoder encodes ``~``; unreserved must stay)
URLEncoder also leaves ``.-_`` bare, which matches unreserved.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def iri_safe_encode(col: Column) -> Column:
    """Percent-encode everything outside RFC 3986 unreserved chars."""
    enc = F.url_encode(col.cast("string"))
    enc = F.replace(enc, F.lit("+"), F.lit("%20"))
    enc = F.replace(enc, F.lit("*"), F.lit("%2A"))
    return F.replace(enc, F.lit("%7E"), F.lit("~"))


def form_encode(col: Column) -> Column:
    """Reference-compatible Java URLEncoder behavior (space → ``+``) for
    the golden-parity compat mode (jena.encodeURLs=true semantics)."""
    return F.url_encode(col.cast("string"))
