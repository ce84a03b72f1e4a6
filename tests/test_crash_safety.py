"""Crash safety: a writer dying BETWEEN writing data files and
publishing the snapshot must leave the table unchanged (readers never
see the half-commit) and leave only debris that remove_orphan_files
reclaims. This is the atomicity contract every lake write path builds
on (reference parity: the commit either lands in the catalog or never
happened — LocalIcebergCatalogTest.java's restart assertions)."""

import glob
import os

import pytest

from icebergplus_spark.lake import LocalLakeCatalog
from icebergplus_spark.lake.maintenance import remove_orphan_files
from icebergplus_spark.sources import load_table


class _Boom(RuntimeError):
    pass


@pytest.fixture()
def table(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    cat = LocalLakeCatalog(spark, str(tmp_path)).start()
    t = cat.create_table("db.n", nation.schema)
    return t.append(nation), nation, cat


def _data_files(t):
    return set(
        glob.glob(os.path.join(t.location, "**", "*.parquet"), recursive=True)
    )


def test_crash_before_publish_leaves_table_unchanged(table, spark, monkeypatch):
    t, nation, _cat = table
    snap = t.current_snapshot_id
    rows = sorted(map(tuple, t.scan().collect()))
    files_before = _data_files(t)

    # the writer dies after data files + manifest are on disk, before
    # the metadata pointer moves
    def boom(meta_dir, version, payload):
        raise _Boom("simulated crash at publish")

    monkeypatch.setattr(t.io, "publish", boom)
    with pytest.raises(_Boom):
        t.append(nation)
    monkeypatch.undo()

    # reader view: nothing happened
    t = t.refresh()
    assert t.current_snapshot_id == snap
    assert sorted(map(tuple, t.scan().collect())) == rows
    # debris exists (the aborted write's data files) ...
    debris = _data_files(t) - files_before
    assert debris, "expected aborted-write debris on disk"
    # ... and orphan cleanup reclaims exactly it
    report = remove_orphan_files(t, older_than_s=0)
    assert report["deleted"] >= len(debris) - 1  # manifest tmp may count too
    assert _data_files(t) == files_before
    # the table still reads clean after cleanup
    assert sorted(map(tuple, t.scan().collect())) == rows


def test_crashed_writer_does_not_block_next_commit(table, spark, monkeypatch):
    t, nation, cat = table
    def boom(meta_dir, version, payload):
        raise _Boom()

    monkeypatch.setattr(t.io, "publish", boom)
    with pytest.raises(_Boom):
        t.append(nation.limit(3))
    monkeypatch.undo()

    # a fresh writer (new table handle, same warehouse) commits fine
    t2 = cat.load_table("db.n").append(nation.limit(2))
    assert t2.current_snapshot_id != t.current_snapshot_id
    assert t2.scan().count() == nation.count() + 2
