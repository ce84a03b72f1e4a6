"""icebergplus_spark — a PySpark-native data-lake engine.

Re-expresses the capabilities of the reference library
(icebergplus/icebergplus: a local Iceberg catalog + metrics reporter,
see SURVEY.md) as an idiomatic PySpark engine:

- ``icebergplus_spark.lake`` — catalog / table / snapshot / compaction /
  metrics layer (parity with the reference's actual surface).
- ``icebergplus_spark.operators`` — the relational + LLM-data-pipeline
  query operator battery (SURVEY.md §2.B), each registered with a
  DuckDB-oracle SQL equivalent for the driver's correctness harness.
- ``icebergplus_spark.sources`` — table loading helpers over the driver's
  parquet testdata and our lake tables.
"""

from icebergplus_spark.session import get_spark, prepare_session

__all__ = ["get_spark", "prepare_session"]
__version__ = "0.1.0"
