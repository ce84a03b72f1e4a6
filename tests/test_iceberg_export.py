"""Iceberg v2 export conformance battery (r12, VERDICT r11 #5).

pyiceberg is absent in this container, so conformance is proven two
ways: structurally against the published Table Spec (required
TableMetadata fields, reserved manifest field-ids, single-value binary
bound serialization, string-valued summary metrics), and
cross-implementation — the JVM ``org.apache.avro`` reference reader
that ships with pyspark must parse the manifest and manifest-list
files and yield the same records our codec decodes."""

import json
import os
import struct

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from icebergplus_spark.lake import LocalLakeCatalog
from icebergplus_spark.lake.iceberg_export import export_iceberg_snapshot
from icebergplus_spark.sources.avro_io import read_ocf_generic

T = StructType(
    [
        StructField("k", LongType(), False),
        StructField("name", StringType(), True),
        StructField("price", DoubleType(), True),
        StructField("ts", TimestampType(), True),
    ]
)


def _mk(spark, tmp_path):
    from datetime import datetime

    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.exp", T)
    rows = [
        (i, f"n{i}" if i % 3 else None, float(i), datetime(2024, 1, 1 + i))
        for i in range(10)
    ]
    t.append(spark.createDataFrame(rows, T).coalesce(2))
    t.append(
        spark.createDataFrame(
            [
                (100 + i, "x", 0.5, datetime(2025, 6, 1 + i))
                for i in range(5)
            ],
            T,
        ).coalesce(1)
    )
    return cat, t


def _export(spark, tmp_path):
    cat, t = _mk(spark, tmp_path)
    dest = str(tmp_path / "iceberg_tbl")
    meta_path = export_iceberg_snapshot(t, dest)
    with open(meta_path) as f:
        md = json.load(f)
    return cat, t, dest, md


REQUIRED_V2_KEYS = {
    "format-version",
    "table-uuid",
    "location",
    "last-sequence-number",
    "last-updated-ms",
    "last-column-id",
    "schemas",
    "current-schema-id",
    "partition-specs",
    "default-spec-id",
    "last-partition-id",
    "sort-orders",
    "default-sort-order-id",
    "snapshots",
    "current-snapshot-id",
}


def test_metadata_json_required_fields(spark, tmp_path):
    _, t, dest, md = _export(spark, tmp_path)
    assert REQUIRED_V2_KEYS <= set(md)
    assert md["format-version"] == 2
    schema = md["schemas"][md["current-schema-id"]]
    # field-ids are the ENGINE's persisted ids, 1:1
    assert {f["name"]: f["id"] for f in schema["fields"]} == t.field_ids
    assert [f["type"] for f in schema["fields"]] == [
        "long",
        "string",
        "double",
        "timestamptz",
    ]
    assert schema["fields"][0]["required"] is True
    assert md["last-column-id"] == max(t.field_ids.values())
    snap = md["snapshots"][0]
    assert snap["snapshot-id"] == md["current-snapshot-id"]
    assert os.path.exists(snap["manifest-list"])
    s = snap["summary"]
    assert s["operation"] == "append"
    # spec: summary metric values are strings
    assert s["total-records"] == "15" and s["total-data-files"] == "3"
    # version-hint makes the tree a discoverable Hadoop-catalog table
    with open(os.path.join(dest, "metadata", "version-hint.text")) as f:
        assert f.read() == "1"


def test_manifest_list_spec_fields(spark, tmp_path):
    _, _, _, md = _export(spark, tmp_path)
    schema, records = read_ocf_generic(md["snapshots"][0]["manifest-list"])
    fid = {
        f["name"]: f.get("field-id") for f in schema["fields"]
    }
    # the spec's reserved manifest-list field-ids
    assert fid["manifest_path"] == 500
    assert fid["manifest_length"] == 501
    assert fid["partition_spec_id"] == 502
    assert fid["added_snapshot_id"] == 503
    assert fid["content"] == 517
    assert len(records) == 1
    m = records[0]
    assert os.path.getsize(m["manifest_path"]) == m["manifest_length"]
    assert m["content"] == 0 and m["added_files_count"] == 3
    assert m["added_rows_count"] == 15


def test_manifest_entries_and_bounds(spark, tmp_path):
    _, t, _, md = _export(spark, tmp_path)
    _, [mlist] = read_ocf_generic(md["snapshots"][0]["manifest-list"])
    schema, entries = read_ocf_generic(mlist["manifest_path"])
    # reserved data_file field-ids
    df_schema = next(
        f for f in schema["fields"] if f["name"] == "data_file"
    )["type"]
    fid = {f["name"]: f.get("field-id") for f in df_schema["fields"]}
    assert fid["file_path"] == 100 and fid["content"] == 134
    assert fid["lower_bounds"] == 125 and fid["upper_bounds"] == 128
    assert len(entries) == 3
    ids = t.field_ids
    k_id, ts_id = ids["k"], ids["ts"]
    total = 0
    global_lo = None
    for e in entries:
        assert e["status"] == 1 and e["sequence_number"] == 1
        d = e["data_file"]
        assert d["file_format"] == "PARQUET"
        assert os.path.exists(d["file_path"])
        total += d["record_count"]
        bounds = {b["key"]: b["value"] for b in d["lower_bounds"]}
        lo_k = struct.unpack("<q", bounds[k_id])[0]
        global_lo = lo_k if global_lo is None else min(global_lo, lo_k)
        # timestamp bounds are micros-since-epoch longs
        lo_ts = struct.unpack("<q", bounds[ts_id])[0]
        assert lo_ts > 1_500_000_000 * 1_000_000  # sane epoch-micros
        # doubles carry NO bounds (NaN-omitting stats would mislead
        # external pruners)
        assert ids["price"] not in bounds
    assert total == 15 and global_lo == 0


def test_jvm_reference_reader_parses_export(spark, tmp_path):
    """The files comply with the Avro SPEC, not just our decoder: the
    JVM reference implementation must parse both metadata Avro files
    and agree on the record contents."""
    _, _, _, md = _export(spark, tmp_path)
    jvm = spark.sparkContext._jvm
    list_path = md["snapshots"][0]["manifest-list"]
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(list_path),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    assert reader.hasNext()
    mrec = reader.next()
    manifest_path = str(mrec.get("manifest_path"))
    assert int(mrec.get("added_files_count")) == 3
    assert not reader.hasNext()
    reader.close()

    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(manifest_path),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    jvm_rows = []
    while reader.hasNext():
        rec = reader.next()
        d = rec.get("data_file")
        jvm_rows.append(
            (int(rec.get("status")), str(d.get("file_path")),
             int(d.get("record_count")))
        )
    reader.close()
    _, ours = read_ocf_generic(manifest_path)
    assert jvm_rows == [
        (e["status"], e["data_file"]["file_path"],
         e["data_file"]["record_count"])
        for e in ours
    ]


def test_referenced_data_files_read_back_identical(spark, tmp_path):
    """External engines read the referenced parquet directly — the
    union of the manifest's data files must hold exactly the table's
    rows."""
    _, t, _, md = _export(spark, tmp_path)
    _, [mlist] = read_ocf_generic(md["snapshots"][0]["manifest-list"])
    _, entries = read_ocf_generic(mlist["manifest_path"])
    paths = [e["data_file"]["file_path"] for e in entries]
    got = (
        spark.read.parquet(*paths)
        .select("k", "name", "price", "ts")
        .collect()
    )
    want = t.scan().select("k", "name", "price", "ts").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_tombstoned_snapshot_refuses(spark, tmp_path):
    cat, t = _mk(spark, tmp_path)
    t.delete_where({"k": ("<", 3)})  # MoR position deletes
    with pytest.raises(ValueError, match="compact"):
        export_iceberg_snapshot(t.refresh(), str(tmp_path / "ice"))


def test_unsupported_type_refuses_with_column_name(spark, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh2")).start()
    S = StructType(
        [
            StructField("k", LongType(), True),
            StructField("m", MapType(StringType(), LongType()), True),
        ]
    )
    t = cat.create_table("db.mapcol", S)
    t.append(spark.createDataFrame([(1, {"a": 1})], S))
    with pytest.raises(ValueError, match="'m'"):
        export_iceberg_snapshot(t, str(tmp_path / "ice2"))


def test_import_roundtrip(spark, tmp_path):
    """read_iceberg_snapshot over an exported tree returns exactly the
    table's rows — by table dir (version-hint discovery), metadata dir,
    and metadata.json path alike."""
    from icebergplus_spark.lake.iceberg_export import read_iceberg_snapshot

    _, t, dest, md = _export(spark, tmp_path)
    want = sorted(map(tuple, t.scan().collect()))
    for entry in (
        dest,
        os.path.join(dest, "metadata"),
        os.path.join(dest, "metadata", "v1.metadata.json"),
    ):
        got = read_iceberg_snapshot(spark, entry)
        assert got.columns == ["k", "name", "price", "ts"]
        assert sorted(map(tuple, got.collect())) == want


def test_import_foreign_jvm_written_manifest(spark, tmp_path):
    """A metadata tree whose Avro was written by the JVM reference
    implementation (not our codec) imports identically — the reader
    handles foreign-written OCF bytes, not just its own."""
    import uuid as _uuid

    from icebergplus_spark.lake.iceberg_export import read_iceberg_snapshot
    from icebergplus_spark.sources.avro_io import read_ocf_generic

    _, t, dest, md = _export(spark, tmp_path)
    list_path = md["snapshots"][0]["manifest-list"]
    _, [mlist] = read_ocf_generic(list_path)
    manifest_path = mlist["manifest_path"]
    jvm = spark.sparkContext._jvm
    for src in (list_path, manifest_path):
        # JVM round-trip: reference reader -> reference writer
        reader = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(src),
            jvm.org.apache.avro.generic.GenericDatumReader(),
        )
        schema = reader.getSchema()
        writer = jvm.org.apache.avro.file.DataFileWriter(
            jvm.org.apache.avro.generic.GenericDatumWriter(schema)
        )
        out = src + ".jvm"
        writer.create(schema, jvm.java.io.File(out))
        while reader.hasNext():
            writer.append(reader.next())
        reader.close()
        writer.close()
        os.replace(out, src)
    got = read_iceberg_snapshot(spark, dest)
    want = sorted(map(tuple, t.scan().collect()))
    assert sorted(map(tuple, got.collect())) == want


def test_import_refuses_delete_manifests(spark, tmp_path):
    from icebergplus_spark.lake.iceberg_export import read_iceberg_snapshot
    from icebergplus_spark.sources.avro_io import (
        read_ocf_generic,
        write_ocf_generic,
    )

    _, _, dest, md = _export(spark, tmp_path)
    list_path = md["snapshots"][0]["manifest-list"]
    schema, [mlist] = read_ocf_generic(list_path)
    fake_delete = dict(mlist)
    fake_delete["content"] = 1  # a delete manifest
    write_ocf_generic(list_path, schema, [mlist, fake_delete])
    with pytest.raises(NotImplementedError, match="delete manifests"):
        read_iceberg_snapshot(spark, dest)


def test_schema_evolution_ids_survive_export(spark, tmp_path):
    """Field-ids are the engine's persisted ids — a dropped+added
    column must NOT reuse the dropped id (Iceberg's core invariant)."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh3")).start()
    t = cat.create_table(
        "db.evo",
        StructType(
            [
                StructField("a", LongType(), True),
                StructField("b", StringType(), True),
            ]
        ),
    )
    t.append(
        spark.createDataFrame([(1, "x")], "a long, b string")
    )
    t.drop_column("b").add_column("c", LongType())
    dest = str(tmp_path / "ice3")
    with open(export_iceberg_snapshot(t, dest)) as f:
        md = json.load(f)
    fields = {
        f["name"]: f["id"]
        for f in md["schemas"][md["current-schema-id"]]["fields"]
    }
    assert fields["a"] == 1 and fields["c"] == 3  # id 2 never reused
