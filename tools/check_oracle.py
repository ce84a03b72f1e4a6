"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, sorted column
names, and an order-insensitive value comparison (exact, stricter than
a hash — any mismatch the driver could see, we see first).

Usage: python tools/check_oracle.py [--json out.json] [sf_dir] [query ...]

``--json`` writes the per-query results as a machine-readable file
(CHECKS_r*.json — the committed full-surface record next to the
driver's ~50-query sample).
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_args = sys.argv[1:]
JSON_OUT = None
if "--json" in _args:
    i = _args.index("--json")
    JSON_OUT = _args[i + 1]
    _args = _args[:i] + _args[i + 2 :]
SF_DIR = _args[0] if _args else "/root/testdata/sf0.01"
ONLY = set(_args[1:])

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
        else:
            df[c] = s.astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def main() -> int:
    import __spark_entry__ as e
    from icebergplus_spark.session import get_spark

    # Measurement hygiene (VERDICT r6 #3, same gate as bench.py): the
    # per-query seconds in committed CHECKS_r*.json are only comparable
    # round-over-round when the box was quiet — record the 1-min
    # loadavg and flag the run when it exceeds SPARK_GRAFT_LOAD_GATE
    # (default: half the cores). Correctness statuses are unaffected.
    load_1m = os.getloadavg()[0]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    load_gate = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", cpus / 2))
    if load_1m > load_gate:
        print(
            f"note: loadavg {load_1m:.1f} > gate {load_gate:.0f} — "
            "recorded secs will carry quiet_window=false"
        )

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_weak = 0
    results: dict[str, dict] = {}

    def record(name: str, status: str, rows, secs: float, detail: str | None = None):
        results[name] = {
            "status": status,
            "rows": rows,
            "secs": round(secs, 2),
            "detail": detail,
        }

    for name, fn in sorted(qs.items()):
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            spark_df = fn(spark, SF_DIR)
            # The driver's canonicalizer sorts+hashes column VALUES —
            # array/map/struct/binary cells arrive as unhashable numpy
            # objects and crash it (even on rows-only checks). Catch the
            # schema here, before the driver does.
            from pyspark.sql.types import ArrayType, BinaryType, MapType, StructType

            bad_cols = [
                f"{f.name}:{f.dataType.simpleString()}"
                for f in spark_df.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType, BinaryType))
            ]
            if bad_cols:
                print(
                    f"FAIL {name}: non-hashable output columns {bad_cols} — "
                    "stringify (array_join/to_json/hex) before returning"
                )
                record(name, "fail", None, time.time() - t0, f"non-hashable cols {bad_cols}")
                n_fail += 1
                continue
            sdf = spark_df.toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {type(ex).__name__}: {ex}")
            record(name, "fail", None, time.time() - t0, f"spark error: {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"weak {name}: rows={len(sdf)} ({time.time()-t0:.1f}s) [rows-only check]")
            record(name, "rows_only", len(sdf), time.time() - t0)
            n_weak += 1
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {type(ex).__name__}: {ex}")
            record(name, "fail", len(sdf), time.time() - t0, f"duckdb error: {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        issues = []
        if len(sdf) != len(ddf):
            issues.append(f"rowcount spark={len(sdf)} duckdb={len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            issues.append(f"cols spark={sorted(sdf.columns)} duckdb={sorted(ddf.columns)}")
        if not issues:
            a, b = canon(sdf), canon(ddf)
            # dtype drift report (driver may compare schemas more strictly)
            raw_a = sdf.reindex(sorted(sdf.columns), axis=1).dtypes
            raw_b = ddf.reindex(sorted(ddf.columns), axis=1).dtypes
            def _norm_dt(d: str) -> str:
                # datetime64 unit (ns vs us) is a pandas interchange
                # artifact, not a schema difference
                return "datetime64" if d.startswith("datetime64") else d

            dt_diff = [
                f"{c}: spark={raw_a[c]} duckdb={raw_b[c]}"
                for c in raw_a.index
                if _norm_dt(str(raw_a[c])) != _norm_dt(str(raw_b[c]))
            ]
            if not a.equals(b):
                neq = (a != b) & ~(a.isna() & b.isna())
                bad_cols = [c for c in a.columns if neq[c].any()]
                row = neq.any(axis=1).idxmax()
                issues.append(
                    f"values differ in cols {bad_cols}; first bad row spark={a.loc[row].to_dict()} duckdb={b.loc[row].to_dict()}"
                )
            elif dt_diff:
                issues.append(f"dtype drift: {dt_diff}")
        if issues:
            print(f"FAIL {name}: {'; '.join(issues)}")
            record(name, "fail", len(sdf), time.time() - t0, "; ".join(issues))
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(sdf)} ({time.time()-t0:.1f}s)")
            record(name, "pass", len(sdf), time.time() - t0)
            n_pass += 1
    print(f"\n{n_pass} pass, {n_weak} rows-only, {n_fail} fail")
    if JSON_OUT:
        with open(JSON_OUT, "w") as f:
            json.dump(
                {
                    "sf_dir": SF_DIR,
                    "totals": {"pass": n_pass, "rows_only": n_weak, "fail": n_fail},
                    "loadavg_1m_at_start": round(load_1m, 2),
                    "loadavg_1m_at_end": round(os.getloadavg()[0], 2),
                    "load_gate": load_gate,
                    "quiet_window": load_1m <= load_gate,
                    "queries": results,
                },
                f,
                indent=1,
            )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
