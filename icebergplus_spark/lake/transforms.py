"""Hidden-partitioning transforms (Iceberg PartitionSpec parity).

Iceberg partitions on *transformed* column values — ``days(ts)``,
``bucket(16, id)``, ``truncate(4, code)`` — and resolves query
predicates against them automatically, so writers and readers never
mention partition columns (the reference builds its (empty) spec via
``PartitionSpec.builderFor(schema)``, LocalIcebergCatalogTest.java:71;
transform specs are the same builder's ``day()``/``bucket()`` calls).

Spark-side each transform is a JVM expression computed at write time
into a hidden ``_p_<name>`` column used only for ``partitionBy``; the
Python twin (``py_apply``) maps scan predicates onto partition values
for manifest pruning. Divergence from Iceberg noted per transform:
``bucket`` uses pmod/CRC32 rather than Iceberg's murmur3 — same
placement properties, different bucket assignment.
"""

from __future__ import annotations

import datetime as dt
import re
import zlib
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import Column

_SPEC_RE = re.compile(
    r"^\s*(?:(?P<fn>\w+)\s*\(\s*(?:(?P<param>\d+)\s*,\s*)?(?P<col>\w+)\s*\)|(?P<ident>\w+))\s*$"
)

MONOTONE = {"identity", "years", "months", "days", "hours", "truncate"}
_TIME_FMTS = {
    "years": ("yyyy", "%Y"),
    "months": ("yyyy-MM", "%Y-%m"),
    "days": ("yyyy-MM-dd", "%Y-%m-%d"),
    "hours": ("yyyy-MM-dd-HH", "%Y-%m-%d-%H"),
}


def parse_spec(items: list[str]) -> list[dict[str, Any]]:
    """['days(ts)', 'bucket(8, user_id)', 'region'] → parsed fields."""
    out = []
    for raw in items:
        m = _SPEC_RE.match(raw)
        if not m:
            raise ValueError(f"bad partition spec entry: {raw!r}")
        if m.group("ident"):
            out.append(
                {"transform": "identity", "source": m.group("ident"), "param": None}
            )
            continue
        fn, col = m.group("fn"), m.group("col")
        param = int(m.group("param")) if m.group("param") else None
        if fn in ("year", "month", "day", "hour"):  # Iceberg singular aliases
            fn += "s"
        if fn not in ("years", "months", "days", "hours", "bucket", "truncate"):
            raise ValueError(f"unknown transform: {fn}")
        if fn in ("bucket", "truncate") and not param:
            raise ValueError(f"{fn} needs a parameter: {raw!r}")
        out.append({"transform": fn, "source": col, "param": param})
    return out


def field_name(f: dict[str, Any]) -> str:
    """Hidden partition column name for a non-identity field."""
    t, s, p = f["transform"], f["source"], f["param"]
    if t == "identity":
        return s
    return f"_p_{s}_{t}" + (f"_{p}" if p is not None else "")


def spark_expr(f: dict[str, Any], src: Column, src_type: str) -> Column:
    """JVM-side transform of the source column (write path)."""
    t, p = f["transform"], f["param"]
    if t == "identity":
        return src
    if t in _TIME_FMTS:
        return F.date_format(src, _TIME_FMTS[t][0])
    if t == "bucket":
        if src_type in ("int", "bigint", "smallint", "tinyint"):
            return F.pmod(src, F.lit(p))
        # strings: CRC32 (java.util.zip.CRC32 == zlib.crc32 → Python twin)
        return F.pmod(F.crc32(src.cast("string")), F.lit(p))
    if t == "truncate":
        if src_type in ("int", "bigint", "smallint", "tinyint"):
            return src - F.pmod(src, F.lit(p))
        return F.substring(src.cast("string"), 1, p)
    raise ValueError(t)


def py_apply(f: dict[str, Any], value: Any, src_type: str) -> Any:
    """Python twin of spark_expr for predicate→partition mapping."""
    t, p = f["transform"], f["param"]
    if t == "identity":
        return value
    if t in _TIME_FMTS:
        if isinstance(value, str):
            value = dt.datetime.fromisoformat(value)
        return value.strftime(_TIME_FMTS[t][1])
    if t == "bucket":
        if isinstance(value, int):
            return value % p
        return zlib.crc32(str(value).encode()) % p
    if t == "truncate":
        if isinstance(value, int):
            return value - (value % p)
        return str(value)[:p]
    raise ValueError(t)


def partition_value_type(f: dict[str, Any], src_type: str) -> str:
    """Type of the value parsed back out of the Hive path segment."""
    t = f["transform"]
    if t == "identity":
        return src_type
    if t in _TIME_FMTS:
        return "string"
    if t == "bucket":
        return "int"
    if t == "truncate":
        return src_type if src_type in ("int", "bigint", "smallint", "tinyint") else "string"
    raise ValueError(t)
