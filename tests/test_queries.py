"""Registry-wide smoke + spot oracle checks (the driver runs the full
oracle gate; here we keep a fast representative subset green)."""

import duckdb
import pandas as pd
import pytest

from icebergplus_spark import registry

registry.load_all()

SPOT_ORACLE = [
    "q01_pricing_summary",
    "q05_local_supplier_volume",
    "q20_topk_per_group",
    "q42_sessionize",
    "q43_asof_join",
    "t01_text_stats",
    "s01_topk_bruteforce",
]


def test_registry_nonempty():
    assert len(registry.QUERIES) >= 40
    # every oracle belongs to a registered query
    assert set(registry.ORACLES) <= set(registry.QUERIES)


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    assert df.columns  # stable, non-empty schema
    assert df.count() >= 0


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        else:
            df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", SPOT_ORACLE)
def test_spot_oracle(spark, sf_dir, name):
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    sdf = _canon(registry.QUERIES[name](spark, sf_dir).toPandas())
    ddf = _canon(con.sql(registry.ORACLES[name]).df())
    pd.testing.assert_frame_equal(sdf, ddf)
