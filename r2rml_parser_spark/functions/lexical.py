"""XSD lexical-form rendering of column values — pure Catalyst expressions.

The reference relies on the JDBC driver's string rendering plus Jena's XSD
canonical forms (reference: beans/Generator.java:837-853, golden files
D005/D016: doubles as ``8.025E1``, dates ``1981-10-10``, dateTimes
``2009-10-10T12:12:22``, booleans ``true``/``false``, binary as uppercase
hex inside IRI templates, base64 for typed literals). Everything here
stays JVM-side (whole-stage codegen) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from r2rml_parser_spark.rdf.terms import XSD

#: Spark type → XSD datatype IRI for TermType.AUTO column objects.
#: Mirrors the reference's SQL-name table (UtilImpl.java:308-362):
#: character types map to *plain* literals (None).
SPARK_TO_XSD: dict[type, str | None] = {
    T.StringType: None,
    T.CharType: None,
    T.VarcharType: None,
    T.ByteType: XSD + "integer",
    T.ShortType: XSD + "integer",
    T.IntegerType: XSD + "integer",
    T.LongType: XSD + "integer",
    T.FloatType: XSD + "double",
    T.DoubleType: XSD + "double",
    T.DecimalType: XSD + "decimal",
    T.BooleanType: XSD + "boolean",
    T.DateType: XSD + "date",
    T.TimestampType: XSD + "dateTime",
    T.TimestampNTZType: XSD + "dateTime",
    T.BinaryType: XSD + "base64Binary",
}


def xsd_datatype_for(dt: T.DataType) -> str | None:
    """Inferred XSD datatype IRI for a Spark column type (None = plain)."""
    for klass, xsd in SPARK_TO_XSD.items():
        if isinstance(dt, klass):
            return xsd
    raise ValueError(f"unsupported column type for literal mapping: {dt}")


def canonical_double(col: Column) -> Column:
    """XSD-canonical double lexical form (``30.0`` → ``3.0E1``) as a pure
    SQL-expression pipeline.

    printf('%.15E') then canonicalize: trim trailing mantissa zeros (keep
    one fractional digit), drop exponent sign '+' and leading zeros.
    15 significant digits cover every value in the compliance corpus;
    doubles needing 17 digits round (documented delta vs Jena).
    """
    s = F.printf(F.lit("%.15E"), col)
    mantissa = F.substring_index(s, "E", 1)
    mantissa = F.regexp_replace(mantissa, r"(\.\d*?)0+$", r"$1")
    mantissa = F.regexp_replace(mantissa, r"\.$", ".0")
    exponent = F.substring_index(s, "E", -1)
    exponent = F.regexp_replace(exponent, r"^\+", "")
    exponent = F.regexp_replace(exponent, r"^(-?)0+(\d)", r"$1$2")
    return (
        F.when(F.isnan(col), F.lit("NaN"))
        .when(col == float("inf"), F.lit("INF"))
        .when(col == float("-inf"), F.lit("-INF"))
        .otherwise(F.concat(mantissa, F.lit("E"), exponent))
    )


def canonical_timestamp(col: Column) -> Column:
    """XSD dateTime: ``yyyy-MM-ddTHH:mm:ss[.fff]`` — fraction only when
    non-zero, trailing fraction zeros trimmed."""
    s = F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    s = F.regexp_replace(s, r"(\.\d*?)0+$", r"$1")
    return F.regexp_replace(s, r"\.$", "")


def lexical(col: Column, dt: T.DataType) -> Column:
    """Lexical string for a column value, per its Spark type.

    Used both for literal object values and for template-field expansion
    (IRI templates render binary as uppercase hex, D016 r2rmle golden)."""
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return canonical_double(col.cast("double"))
    if isinstance(dt, T.DateType):
        return F.date_format(col, "yyyy-MM-dd")
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return canonical_timestamp(col)
    if isinstance(dt, T.BooleanType):
        return F.when(col, F.lit("true")).when(~col, F.lit("false"))
    if isinstance(dt, T.BinaryType):
        return F.base64(col)
    if isinstance(dt, T.DecimalType):
        # strip trailing fractional zeros: 30.00 → 30.0? XSD canonical keeps
        # minimal form "30.0"; integral decimals render with ".0"
        s = col.cast("string")
        s = F.regexp_replace(s, r"(\.\d*?)0+$", r"$1")
        return F.regexp_replace(s, r"\.$", ".0")
    return col.cast("string")


def template_field_lexical(col: Column, dt: T.DataType) -> Column:
    """Template-field rendering differs from literal rendering for binary
    columns only: IRI templates embed uppercase hex (D016 mappede.nq)."""
    if isinstance(dt, T.BinaryType):
        return F.upper(F.hex(col))
    return lexical(col, dt)
