"""Load SQL DDL+INSERT fixture scripts into Spark DataFrames.

The reference's compliance harness re-creates a live Postgres database
from each test case's ``create.sql`` (ComplianceTests.java:196-229). We
interpret the same scripts driver-side into DataFrames instead — no
database needed. Supports the subset the W3C RDB2RDF corpus uses:
CREATE TABLE with quoted/unicode identifiers, PRIMARY/FOREIGN KEY
clauses (ignored), INSERT INTO ... VALUES with strings ('' escapes),
numbers, NULL, TRUE/FALSE, hex blobs X'..', and DATE/TIMESTAMP strings.

Postgres CHAR(n) semantics are emulated by right-padding values to n
(golden D018 expects "Venus          ").
"""

from __future__ import annotations

import datetime as dt
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


@dataclass
class _Column:
    name: str
    spark_type: T.DataType
    char_pad: int | None = None


_TYPE_RE = re.compile(r"^([A-Za-z0-9 ]+?)\s*(?:\((\d+)(?:\s*,\s*(\d+))?\))?$", re.IGNORECASE)


def _parse_type(sql_type: str) -> tuple[T.DataType, int | None]:
    m = _TYPE_RE.match(sql_type.strip())
    if not m:
        raise ValueError(f"unparsable SQL type: {sql_type!r}")
    base = m.group(1).strip().lower()
    size = int(m.group(2)) if m.group(2) else None
    scale = int(m.group(3)) if m.group(3) else 0
    if base in ("varchar", "character varying", "text"):
        return T.StringType(), None
    if base in ("char", "character", "bpchar"):
        return T.StringType(), size
    if base in ("integer", "int", "int4", "smallint", "int2", "serial"):
        return T.IntegerType(), None
    if base in ("bigint", "int8", "bigserial"):
        return T.LongType(), None
    if base in ("float", "real", "float4", "float8", "double precision", "double"):
        return T.DoubleType(), None
    if base in ("numeric", "decimal"):
        return T.DecimalType(size or 38, scale), None
    if base in ("boolean", "bool"):
        return T.BooleanType(), None
    if base == "date":
        return T.DateType(), None
    if base in ("timestamp", "timestamp without time zone", "timestamptz", "datetime"):
        return T.TimestampType(), None
    if base in ("bytea", "binary", "varbinary", "blob") or base.startswith("bit"):
        return T.BinaryType(), None
    raise ValueError(f"unsupported SQL type: {sql_type!r}")


def _split_statements(script: str) -> list[str]:
    """Split on ';' outside single-quoted strings."""
    out, cur, in_str = [], [], False
    i = 0
    while i < len(script):
        c = script[i]
        if in_str:
            cur.append(c)
            if c == "'":
                if i + 1 < len(script) and script[i + 1] == "'":
                    cur.append("'")
                    i += 1
                else:
                    in_str = False
        elif c == "'":
            in_str = True
            cur.append(c)
        elif c == ";":
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
        i += 1
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return [s for s in out if s]


def _ident(tok: str) -> str:
    tok = tok.strip()
    if tok.startswith('"') and tok.endswith('"'):
        return tok[1:-1]
    if tok.startswith("`") and tok.endswith("`"):  # MySQL quoting
        return tok[1:-1]
    return tok


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    parts, cur, depth, in_str = [], [], 0, False
    i = 0
    while i < len(s):
        c = s[i]
        if in_str:
            cur.append(c)
            if c == "'":
                if i + 1 < len(s) and s[i + 1] == "'":
                    cur.append("'")
                    i += 1
                else:
                    in_str = False
        elif c == "'":
            in_str = True
            cur.append(c)
        elif c == "(":
            depth += 1
            cur.append(c)
        elif c == ")":
            depth -= 1
            cur.append(c)
        elif c == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


_CREATE_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?P<name>\"[^\"]+\"|`[^`]+`|\S+)\s*\((?P<body>.*)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_INSERT_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+(?P<name>\"[^\"]+\"|`[^`]+`|\S+)\s*"
    r"(?:\((?P<cols>[^)]*)\)\s*)?VALUES\s*\((?P<vals>.*)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _parse_value(tok: str, col: _Column):
    tok = tok.strip()
    up = tok.upper()
    if up == "NULL":
        return None
    if up in ("TRUE", "FALSE"):
        return up == "TRUE"
    if (up.startswith("X'") or up.startswith("E'\\\\X")) and up.endswith("'"):
        hexpart = re.sub(r"[^0-9A-Fa-f]", "", tok[1:])
        return bytes.fromhex(hexpart)
    if tok.startswith("'") and tok.endswith("'"):
        s = tok[1:-1].replace("''", "'")
        t = col.spark_type
        if isinstance(t, T.DateType):
            return dt.date.fromisoformat(s)
        if isinstance(t, T.TimestampType):
            return dt.datetime.fromisoformat(s)
        if isinstance(t, T.BinaryType):
            return s.encode()
        if col.char_pad:
            return s.ljust(col.char_pad)
        return s
    # bare number
    t = col.spark_type
    if isinstance(t, (T.DoubleType, T.FloatType)):
        return float(tok)
    if isinstance(t, T.DecimalType):
        from decimal import Decimal

        return Decimal(tok)
    if isinstance(t, (T.IntegerType, T.LongType)):
        return int(tok)
    if isinstance(t, T.BooleanType):
        return bool(int(tok))
    if isinstance(t, T.StringType):
        return tok
    raise ValueError(f"cannot parse value {tok!r} for {col}")


def load_sql_fixture(spark: SparkSession, script: str) -> dict[str, DataFrame]:
    """Interpret a create.sql script → {table name: DataFrame}."""
    tables: dict[str, list[_Column]] = {}
    rows: dict[str, list[tuple]] = {}

    for stmt in _split_statements(script):
        m = _CREATE_RE.match(stmt)
        if m:
            name = _ident(m.group("name"))
            cols: list[_Column] = []
            for item in _split_top_level(m.group("body")):
                head = item.split()[0].upper().rstrip("(")
                if head in ("PRIMARY", "FOREIGN", "UNIQUE", "CONSTRAINT", "CHECK", "KEY"):
                    continue
                cm = re.match(r'^("([^"]+)"|`([^`]+)`|\S+)\s+(.*)$', item, re.DOTALL)
                colname = _ident(cm.group(1))
                typestr = re.sub(
                    r"\b(PRIMARY\s+KEY|NOT\s+NULL|NULL|UNIQUE|DEFAULT\s+\S+|REFERENCES.*)$",
                    "", cm.group(4), flags=re.IGNORECASE | re.DOTALL,
                ).strip()
                stype, pad = _parse_type(typestr)
                cols.append(_Column(colname, stype, pad))
            tables[name] = cols
            rows[name] = []
            continue
        m = _INSERT_RE.match(stmt)
        if m:
            name = _ident(m.group("name"))
            if name not in tables:
                raise ValueError(f"INSERT into unknown table {name!r}")
            cols = tables[name]
            if m.group("cols"):
                order = [_ident(c) for c in _split_top_level(m.group("cols"))]
                by_name = {c.name: c for c in cols}
                target = [by_name[c] for c in order]
            else:
                target = cols
            vals = _split_top_level(m.group("vals"))
            if len(vals) != len(target):
                raise ValueError(f"arity mismatch in INSERT into {name!r}")
            parsed = {c.name: _parse_value(v, c) for c, v in zip(target, vals)}
            rows[name].append(tuple(parsed.get(c.name) for c in cols))
            continue
        head = stmt.split()[0].upper()
        if head in ("DROP", "SET", "BEGIN", "COMMIT", "ALTER", "--"):
            continue
        raise ValueError(f"unsupported SQL statement: {stmt[:80]!r}")

    out: dict[str, DataFrame] = {}
    for name, cols in tables.items():
        schema = T.StructType([T.StructField(c.name, c.spark_type, True) for c in cols])
        out[name] = spark.createDataFrame(rows[name], schema)
    return out
