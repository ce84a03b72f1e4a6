"""Streaming reads FROM a lake table: a Spark 4 Python streaming data
source whose offsets are snapshot ids.

Iceberg parity: Spark can ``readStream`` an Iceberg table and receive
each committed append as a micro-batch (the reference's table format
feeds streams the same way). Here that is re-expressed with PySpark's
DataSource V2 Python streaming API (`DataSourceStreamReader`): the
offset is ``{"snapshot_id": N}``, `latestOffset` follows the table's
atomic version pointer, and each micro-batch reads exactly the data
files BORN in the snapshot range — never a directory listing, never a
rewritten file.

Semantics (same contract as ``LakeTable.scan_incremental``):
- append / overwrite commits are emitted; compaction, manifest
  rewrites, and delete commits are skipped (they add no rows). This is
  the append-only CDC stream Iceberg's streaming read provides;
  row-level delete events are the CDC-upsert sink's job, not ours.
- schema evolution is honored: files written before a rename are
  mapped physical→logical per the table's column mapping; columns
  added later come back NULL for old files.
- identity-partition values are recovered from the Hive path (they are
  not stored in the data files).

Scale notes: one input partition per data file, so a micro-batch
covering K new files fans out K-wide — the same parallelism a batch
scan of those files would get; the reader yields Arrow record batches
(vectorized, no per-row Python). Planning reads only the (small)
metadata log. At 100 TB nothing here changes: micro-batch size is
bounded by commit cadence, not table size.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

SOURCE_NAME = "lake_stream"


def _make_source():
    """Build the DataSource class. Everything the executors touch is
    defined inside this closure with stdlib/pyarrow/pyspark imports
    only, so cloudpickle ships it without needing this package on the
    Python workers' import path."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    def load_meta(table_dir: str) -> dict:
        meta_dir = os.path.join(table_dir, "metadata")
        with open(os.path.join(meta_dir, "version-pointer.txt")) as f:
            version = int(f.read().strip())
        with open(os.path.join(meta_dir, f"v{version}.metadata.json")) as f:
            return json.load(f)

    class LakeStreamReader(DataSourceStreamReader):
        def __init__(self, options):
            self.table_dir = options["table_dir"]
            self.start_id = int(options.get("from_snapshot_id", 0))

        def initialOffset(self):
            return {"snapshot_id": self.start_id}

        def latestOffset(self):
            meta = load_meta(self.table_dir)
            return {"snapshot_id": meta.get("current_snapshot_id") or 0}

        def partitions(self, start, end):
            import pyarrow.parquet as pq

            meta = load_meta(self.table_dir)
            lo, hi = start["snapshot_id"], end["snapshot_id"]
            mapping = meta.get("column_mapping") or {
                f["name"]: f["name"] for f in meta["schema"]["fields"]
            }
            schema_json = json.dumps(meta["schema"])
            meta_dir = os.path.join(self.table_dir, "metadata")
            # a manifest's BIRTH snapshot is its first appearance in the
            # (id-ordered) log; a micro-batch owns manifests born in
            # (lo, hi] by append/overwrite commits
            seen: set[str] = set()
            paths: list[str] = []
            for s in sorted(meta["snapshots"], key=lambda s: s["snapshot_id"]):
                if s["snapshot_id"] > hi:
                    break
                for m in s["manifests"]:
                    if m in seen:
                        continue
                    seen.add(m)
                    if s["snapshot_id"] > lo and s["operation"] in (
                        "append",
                        "overwrite",
                    ):
                        t = pq.read_table(
                            os.path.join(meta_dir, m), columns=["file_path"]
                        )
                        paths.extend(t.column("file_path").to_pylist())
            return [
                InputPartition(
                    {
                        "path": p,
                        "schema_json": schema_json,
                        "mapping": mapping,
                        "path_values": _parse_path_values(p),
                    }
                )
                for p in sorted(paths)
            ]

        def read(self, partition):
            import pyarrow as pa
            import pyarrow.parquet as pq
            from pyspark.sql.pandas.types import to_arrow_schema
            from pyspark.sql.types import StructType

            spec = partition.value
            logical = StructType.fromJson(json.loads(spec["schema_json"]))
            target = to_arrow_schema(logical)
            tbl = pq.read_table(spec["path"])
            n = tbl.num_rows
            arrays = []
            for i, f in enumerate(logical.fields):
                phys = spec["mapping"].get(f.name, f.name)
                t = target.field(i).type
                if phys in tbl.column_names:
                    col = tbl[phys].combine_chunks()
                elif phys in spec["path_values"]:
                    raw = spec["path_values"][phys]
                    col = pa.array(
                        [None if raw is None else raw] * n, type=pa.string()
                    )
                else:
                    col = pa.nulls(n, type=t)
                arrays.append(col.cast(t))
            out = pa.table(arrays, schema=target)
            yield from out.to_batches()

        def commit(self, end):
            pass  # offsets live in the query's checkpoint, nothing to ack

    def _parse_path_values(path: str) -> dict:
        """Hive-style ``col=value`` path segments → raw string values
        (None for the null-partition marker). Only consulted for
        columns the data file itself lacks."""
        from urllib.parse import unquote

        out: dict[str, str | None] = {}
        for seg in path.split(os.sep)[:-1]:
            if "=" in seg:
                col, _, raw = seg.partition("=")
                out[col] = (
                    None if raw == "__HIVE_DEFAULT_PARTITION__" else unquote(raw)
                )
        return out

    class LakeStreamSource(DataSource):
        @classmethod
        def name(cls):
            return SOURCE_NAME

        def schema(self):
            from pyspark.sql.types import StructType

            return StructType.fromJson(load_meta(self.options["table_dir"])["schema"])

        def streamReader(self, schema):
            return LakeStreamReader(self.options)

    return LakeStreamSource


def register_lake_stream_source(spark: SparkSession) -> None:
    try:
        spark.dataSource.register(_make_source())
    except Exception:
        pass  # already registered in this session


def read_lake_stream(
    spark: SparkSession, table_dir: str, from_snapshot_id: int = 0
) -> DataFrame:
    """``spark.readStream`` over a lake table: every committed append
    becomes a micro-batch (start after ``from_snapshot_id``)."""
    register_lake_stream_source(spark)
    return (
        spark.readStream.format(SOURCE_NAME)
        .option("table_dir", table_dir)
        .option("from_snapshot_id", from_snapshot_id)
        .load()
    )
