"""Multi-table transaction battery (txn.py): atomic cross-table
visibility, every crash window, lease takeover, recovery idempotence —
under BOTH commit-IO strategies. The invariant checked everywhere:
readers never see a torn state (one table's staged version visible,
another's not)."""

import time

import pytest
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from icebergplus_spark.lake import (
    DirectoryLeaseCommitLock,
    LocalLakeCatalog,
    ObjectStoreCommitIO,
    TransactionAborted,
    recover_transactions,
)
from icebergplus_spark.lake.commitio import ConcurrentCommitError

SCHEMA = StructType(
    [StructField("k", IntegerType(), True), StructField("v", StringType(), True)]
)


def _mk(spark, tmp_path, io=None, name="wh"):
    cat = LocalLakeCatalog(spark, str(tmp_path / name), commit_io=io).start()
    a = cat.create_table("db.fact", SCHEMA)
    b = cat.create_table("db.dim", SCHEMA)
    a.append(spark.createDataFrame([(1, "f0")], SCHEMA))
    b.append(spark.createDataFrame([(1, "d0")], SCHEMA))
    return cat


def _counts(cat):
    """Fresh reader's view of both tables — loads resolve txn markers."""
    return (
        cat.load_table("db.fact").scan().count(),
        cat.load_table("db.dim").scan().count(),
    )


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_commit_atomic_both_visible(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    with cat.transaction() as txn:
        txn.append("db.fact", _df(spark, [(2, "f1"), (3, "f2")]))
        txn.append("db.dim", _df(spark, [(2, "d1")]))
    assert _counts(cat) == (3, 2)
    # marker is sealed by the next ordinary commit; resolution stays correct
    cat.load_table("db.fact").append(_df(spark, [(9, "f9")]))
    assert _counts(cat) == (4, 2)


def test_exception_aborts_nothing_visible(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    with pytest.raises(RuntimeError, match="boom"):
        with cat.transaction() as txn:
            txn.append("db.fact", _df(spark, [(2, "f1")]))
            raise RuntimeError("boom")
    assert _counts(cat) == (1, 1)


def test_crash_after_intent_before_any_stage(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    txn = cat.transaction(ttl_s=0.2)
    txn.append("db.fact", _df(spark, [(2, "f1")]))
    txn._begin()  # coordinator dies here
    assert _counts(cat) == (1, 1)
    time.sleep(0.25)
    settled = recover_transactions(cat)
    assert settled.get(txn.txn_id) == "aborted"
    # idempotent: a second sweep reports the same terminal state
    assert recover_transactions(cat).get(txn.txn_id) == "aborted"
    assert _counts(cat) == (1, 1)


def test_crash_between_stage_commits_never_torn(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    txn = cat.transaction(ttl_s=0.3)
    txn.append("db.fact", _df(spark, [(2, "f1")]))
    txn.append("db.dim", _df(spark, [(2, "d1")]))
    txn._begin()
    # stage ONLY the fact table (exactly what _stage_all does), then die
    t = cat.load_table("db.fact")
    t._own_txn = txn.txn_id
    t._staging_txn = {
        "id": txn.txn_id,
        "final_path": txn._final_path,
        "expires": txn._expires,
    }
    t.append(_df(spark, [(2, "f1")]))
    # the staged version exists on disk but is INVISIBLE to readers
    assert _counts(cat) == (1, 1)
    time.sleep(0.35)
    assert recover_transactions(cat).get(txn.txn_id) == "aborted"
    assert _counts(cat) == (1, 1)
    # the table is fully usable afterwards: new commits land above the
    # aborted staged version and build on the pre-txn state
    cat.load_table("db.fact").append(_df(spark, [(3, "f3")]))
    assert _counts(cat) == (2, 1)


def test_crash_before_publish_coordinator_loses_cas(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    txn = cat.transaction(ttl_s=0.3)
    txn.append("db.fact", _df(spark, [(2, "f1")]))
    txn.append("db.dim", _df(spark, [(2, "d1")]))
    txn._begin()
    txn._stage_all()  # both staged; coordinator stalls before publish
    assert _counts(cat) == (1, 1)
    time.sleep(0.35)
    assert recover_transactions(cat).get(txn.txn_id) == "aborted"
    # the slow coordinator wakes up and tries to publish: it LOSES the
    # final-file CAS — commit is never falsely reported
    with pytest.raises(TransactionAborted):
        txn._publish()
    assert _counts(cat) == (1, 1)


def test_crash_after_publish_is_durable(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    txn = cat.transaction(ttl_s=0.2)
    txn.append("db.fact", _df(spark, [(2, "f1")]))
    txn.append("db.dim", _df(spark, [(2, "d1")]))
    txn._begin()
    txn._stage_all()
    txn._publish()  # coordinator dies right after the CAS
    assert _counts(cat) == (2, 2)
    time.sleep(0.25)
    # recovery must NOT abort a committed transaction, even expired
    assert recover_transactions(cat).get(txn.txn_id) == "committed"
    assert _counts(cat) == (2, 2)


def test_inflight_txn_blocks_ordinary_writers_until_lease_expiry(
    spark, tmp_path, monkeypatch
):
    cat = _mk(spark, tmp_path)
    txn = cat.transaction(ttl_s=300.0)  # long lease: stays in-flight
    txn.append("db.fact", _df(spark, [(2, "f1")]))
    txn._begin()
    txn._stage_all()
    # in-flight: an independent writer is refused (write intent held)
    with pytest.raises(ConcurrentCommitError):
        cat.load_table("db.fact").append(_df(spark, [(7, "x")]))
    # lease expiry (simulated by advancing the txn module's clock —
    # Spark write latency makes real sub-second leases racy in tests):
    # the writer aborts the txn via the same CAS and wins
    from icebergplus_spark.lake import txn as txn_mod

    real_time = time.time
    monkeypatch.setattr(txn_mod.time, "time", lambda: real_time() + 400.0)
    cat.load_table("db.fact").append(_df(spark, [(7, "x")]))
    assert _counts(cat) == (2, 1)
    # ... and the zombie coordinator's publish now fails
    with pytest.raises(TransactionAborted):
        txn._publish()


def test_sequential_ops_on_one_table_compose(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    with cat.transaction() as txn:
        txn.append("db.fact", _df(spark, [(2, "f1")]))
        txn.append("db.fact", _df(spark, [(3, "f2")]))
        txn.overwrite("db.dim", _df(spark, [(5, "d5")]))
    assert _counts(cat) == (3, 1)
    assert {r.v for r in cat.load_table("db.dim").scan().collect()} == {"d5"}


def test_delete_and_update_in_txn(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    cat.load_table("db.fact").append(_df(spark, [(2, "f1"), (3, "f2")]))
    with cat.transaction() as txn:
        txn.delete("db.fact", {"k": (">=", 3)})
        txn.update_where("db.dim", {"k": ("=", 1)}, {"v": "updated"})
    assert _counts(cat) == (2, 1)
    assert cat.load_table("db.dim").scan().collect()[0].v == "updated"


def test_txn_under_object_store_io(spark, tmp_path):
    io = ObjectStoreCommitIO(lock=DirectoryLeaseCommitLock())
    cat = _mk(spark, tmp_path, io=io, name="wh_os")
    with cat.transaction() as txn:
        txn.append("db.fact", _df(spark, [(2, "f1")]))
        txn.append("db.dim", _df(spark, [(2, "d1")]))
    assert _counts(cat) == (2, 2)
    # abort path under object-store semantics too
    txn2 = cat.transaction(ttl_s=0.2)
    txn2.append("db.fact", _df(spark, [(8, "g")]))
    txn2._begin()
    txn2._stage_all()
    time.sleep(0.25)
    assert recover_transactions(cat).get(txn2.txn_id) == "aborted"
    assert _counts(cat) == (2, 2)


def test_reader_view_is_all_or_nothing_at_every_phase(spark, tmp_path):
    """The torn-state check, phase by phase: at no point does a fresh
    reader see (new fact, old dim) or (old fact, new dim)."""
    cat = _mk(spark, tmp_path)
    txn = cat.transaction()
    txn.append("db.fact", _df(spark, [(2, "f1")]))
    txn.append("db.dim", _df(spark, [(2, "d1")]))
    assert _counts(cat) == (1, 1)  # before begin
    txn._begin()
    assert _counts(cat) == (1, 1)  # intent written
    txn._stage_all()
    assert _counts(cat) == (1, 1)  # ALL staged, still invisible
    txn._publish()
    assert _counts(cat) == (2, 2)  # one CAS flipped both


def test_catalog_start_runs_recovery(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    txn = cat.transaction(ttl_s=0.2)
    txn.append("db.fact", _df(spark, [(2, "f1")]))
    txn._begin()
    t = cat.load_table("db.fact")
    t._own_txn = txn.txn_id
    t._staging_txn = {
        "id": txn.txn_id,
        "final_path": txn._final_path,
        "expires": txn._expires,
    }
    t.append(_df(spark, [(2, "f1")]))
    time.sleep(0.25)
    # a NEW catalog process over the same warehouse settles the txn
    cat2 = LocalLakeCatalog(spark, cat.root_dir).start()
    assert cat2.recovered_txns.get(txn.txn_id) == "aborted"
    assert _counts(cat2) == (1, 1)


def test_empty_txn_is_noop(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    report = cat.transaction().commit()
    assert report["tables"] == []
    assert _counts(cat) == (1, 1)


def test_concurrent_txns_disjoint_tables_both_commit(spark, tmp_path):
    """Two transactions over DISJOINT table sets interleave their
    stage/publish phases freely — both must commit."""
    cat = _mk(spark, tmp_path)
    cat.create_table("db.c", SCHEMA).append(_df(spark, [(1, "c0")]))
    cat.create_table("db.d", SCHEMA).append(_df(spark, [(1, "d0")]))
    t1 = cat.transaction()
    t1.append("db.fact", _df(spark, [(2, "f1")]))
    t1.append("db.dim", _df(spark, [(2, "d1")]))
    t2 = cat.transaction()
    t2.append("db.c", _df(spark, [(2, "c1")]))
    t2.append("db.d", _df(spark, [(2, "d2")]))
    # interleave: begin1, begin2, stage1, stage2, publish2, publish1
    t1._begin(), t2._begin()
    t1._stage_all(), t2._stage_all()
    t2._publish(), t1._publish()
    assert _counts(cat) == (2, 2)
    assert cat.load_table("db.c").scan().count() == 2
    assert cat.load_table("db.d").scan().count() == 2


def test_concurrent_txns_overlapping_table_second_backs_off(spark, tmp_path):
    """Two transactions staging the SAME table: the second hits the
    first's in-flight write intent and aborts cleanly; the first still
    commits; the table never loses either its pre-state or txn1's
    write."""
    cat = _mk(spark, tmp_path)
    t1 = cat.transaction()
    t1.append("db.fact", _df(spark, [(2, "f1")]))
    t1._begin()
    t1._stage_all()
    t2 = cat.transaction()
    t2.append("db.fact", _df(spark, [(3, "g1")]))
    with pytest.raises(ConcurrentCommitError):
        t2.commit()
    # the failed commit() aborted txn2 via its own final CAS
    assert t2._state == "aborted"
    t1._publish()
    assert _counts(cat) == (2, 1)
    rows = {r.v for r in cat.load_table("db.fact").scan().collect()}
    assert rows == {"f0", "f1"}  # txn1 landed, txn2 never did


def test_expire_snapshots_refuses_over_inflight_txn(spark, tmp_path):
    """Maintenance must not publish over an undecided staged head —
    the same lost-update guard the write paths carry."""
    from icebergplus_spark.lake import expire_snapshots

    cat = _mk(spark, tmp_path)
    for i in range(3):
        cat.load_table("db.fact").append(_df(spark, [(10 + i, "x")]))
    txn = cat.transaction(ttl_s=300.0)
    txn.append("db.fact", _df(spark, [(99, "staged")]))
    txn._begin()
    txn._stage_all()
    t = cat.load_table("db.fact")
    with pytest.raises(ConcurrentCommitError):
        expire_snapshots(t, keep_last=1)
    txn._publish()
    # after the txn resolves, maintenance proceeds and the txn's write
    # survives expiry
    t = cat.load_table("db.fact")
    expire_snapshots(t, keep_last=1)
    assert 99 in {r.k for r in t.scan().collect()}


def test_lake_stream_source_never_emits_staged_rows(spark, tmp_path):
    """The snapshot-offset stream source resolves transaction markers
    itself: an in-flight staged version contributes nothing; after the
    publish CAS the staged snapshot arrives as a normal micro-batch."""
    import uuid as _uuid

    from icebergplus_spark.streaming.lake_source import read_lake_stream

    cat = _mk(spark, tmp_path)
    t = cat.load_table("db.fact")
    txn = cat.transaction(ttl_s=300.0)
    txn.append("db.fact", _df(spark, [(50, "staged")]))
    txn._begin()
    txn._stage_all()

    def drain(tag):
        name = f"txn_stream_{tag}_{_uuid.uuid4().hex[:6]}"
        q = (
            read_lake_stream(spark, t.table_dir)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r.k for r in spark.table(name).collect()}

    assert drain("inflight") == {1}  # staged row invisible
    txn._publish()
    assert drain("committed") == {1, 50}


def test_changelog_sees_committed_txn_not_aborted(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    t = cat.load_table("db.fact")
    base = t.current_snapshot_id
    with cat.transaction() as txn:
        txn.append("db.fact", _df(spark, [(2, "committed")]))
    txn2 = cat.transaction()
    txn2.append("db.fact", _df(spark, [(3, "aborted")]))
    txn2._begin()
    txn2._stage_all()
    txn2.abort()
    cl = cat.load_table("db.fact").scan_changelog(from_snapshot_id=base)
    assert {(r.k, r._change_type) for r in cl.collect()} == {(2, "insert")}


def test_expire_metadata_versions_protects_resolution_chain(spark, tmp_path):
    """Vacuuming metadata under an aborted staged head must keep the
    base_version files the resolution chain needs."""
    from icebergplus_spark.lake import expire_metadata_versions

    cat = _mk(spark, tmp_path)
    for i in range(4):
        cat.load_table("db.fact").append(_df(spark, [(10 + i, "x")]))
    txn = cat.transaction(ttl_s=0.01)
    txn.append("db.fact", _df(spark, [(99, "staged")]))
    txn._begin()
    txn._stage_all()
    txn.abort()  # aborted marker stays at the physical head
    t = cat.load_table("db.fact")
    expire_metadata_versions(t, keep_last=1)
    # fresh reader still resolves straight past the aborted head
    assert cat.load_table("db.fact").scan().count() == 5


def test_decide_is_content_atomic(tmp_path):
    """The final-file CAS never exposes an empty-content window: racing
    deciders all converge on the single verdict that stuck."""
    import threading

    from icebergplus_spark.lake.txn import _decide, final_state

    final = str(tmp_path / "race.final")
    results = []

    def race(verdict):
        results.append(_decide(final, verdict))

    threads = [
        threading.Thread(target=race, args=("committed",)),
        threading.Thread(target=race, args=("aborted",)),
        threading.Thread(target=race, args=("committed",)),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert len(set(results)) == 1  # everyone saw the same decision
    assert final_state(final) == results[0]


def test_txn_stress_two_coordinators_interleaved_rounds(spark, tmp_path):
    """Repeated rounds of two transactions over overlapping tables with
    retry-on-conflict: every round exactly one commits per conflict
    pair, nothing tears, and the final table contents equal the set of
    committed batches (serializable history)."""
    cat = _mk(spark, tmp_path)
    committed: set[int] = set()
    batch_id = 100
    for _ in range(4):
        batch_id += 1
        t1 = cat.transaction()
        t1.append("db.fact", _df(spark, [(batch_id, "a")]))
        t1.append("db.dim", _df(spark, [(batch_id, "a")]))
        batch_id += 1
        t2 = cat.transaction()
        t2.append("db.fact", _df(spark, [(batch_id, "b")]))
        t2.append("db.dim", _df(spark, [(batch_id, "b")]))
        winners = 0
        for txn, bid in ((t1, batch_id - 1), (t2, batch_id)):
            try:
                txn.commit()
                committed.add(bid)
                winners += 1
            except Exception:
                txn.abort()
        assert winners >= 1  # at least one per round must land
        # invariant after every round: fact and dim agree exactly
        fact = {r.k for r in cat.load_table("db.fact").scan().collect()}
        dim = {r.k for r in cat.load_table("db.dim").scan().collect()}
        assert fact == dim == committed | {1}


def test_gc_settled_transactions(spark, tmp_path):
    """ADVICE r4: settled intent/final records are garbage-collected
    once (a) terminal, (b) past lease+grace, and (c) no table HEAD
    still carries the marker — and collection never changes any
    reader's view."""
    import os

    from icebergplus_spark.lake.txn import gc_settled_transactions, txns_dir

    cat = _mk(spark, tmp_path, name="whgc")
    with cat.transaction(ttl_s=0.4) as txn:
        txn.append("db.fact", _df(spark, [(2, "f1")]))
        txn.append("db.dim", _df(spark, [(2, "d1")]))
    d = txns_dir(cat.root_dir)
    n_records = len(os.listdir(d))
    assert n_records >= 2  # intent + final
    time.sleep(0.5)  # lease lapses (txn already committed — no takeover)

    # heads still carry the marker → NOT collectable, view unchanged
    assert gc_settled_transactions(cat, grace_s=0.0) == 0
    assert _counts(cat) == (2, 2)

    # ordinary commits seal the marker on both heads → collectable
    cat.load_table("db.fact").append(_df(spark, [(9, "f9")]))
    cat.load_table("db.dim").append(_df(spark, [(9, "d9")]))
    assert gc_settled_transactions(cat, grace_s=0.0) == 1
    assert os.listdir(d) == []
    assert _counts(cat) == (3, 3)  # committed data still visible

    # aborted txns collect the same way (no seal needed: resolution of
    # a missing final falls back exactly like 'aborted' after takeover,
    # but we still require the heads clear — here they carry the marker)
    txn = cat.transaction(ttl_s=0.4)
    txn.append("db.fact", _df(spark, [(4, "f4")]))
    try:
        txn.commit()
    except Exception:
        pass
    txn2 = cat.transaction(ttl_s=0.4)
    txn2.append("db.dim", _df(spark, [(5, "d5")]))
    txn2._begin()
    txn2._stage_all()
    txn2.abort()
    time.sleep(0.5)
    before = _counts(cat)
    cat.load_table("db.fact").append(_df(spark, [(10, "fa")]))
    cat.load_table("db.dim").append(_df(spark, [(10, "da")]))
    collected = gc_settled_transactions(cat, grace_s=0.0)
    assert collected == 2
    assert os.listdir(d) == []
    assert _counts(cat) == (before[0] + 1, before[1] + 1)

    # recovery sweep stays a no-op on the clean directory
    assert recover_transactions(cat) == {}


def test_gc_skips_txn_on_transient_read_failure(spark, tmp_path, monkeypatch):
    """ADVICE r5: a TRANSIENT head-read failure (sqlite busy, fs
    hiccup) must read as 'still referenced' — GC skipping the txn —
    not as 'no reference'. Deleting a still-referenced COMMITTED final
    would let recovery abort the marker and flip staged versions
    invisible."""
    import os

    from icebergplus_spark.lake import catalog as catmod
    from icebergplus_spark.lake.txn import gc_settled_transactions, txns_dir

    cat = _mk(spark, tmp_path, name="whgcerr")
    with cat.transaction(ttl_s=0.2) as txn:
        txn.append("db.fact", _df(spark, [(2, "f1")]))
    time.sleep(0.3)
    d = txns_dir(cat.root_dir)
    n_before = len(os.listdir(d))
    assert n_before >= 2

    # heads still carry the marker AND loading blows up transiently:
    # conservative skip, records intact
    orig = type(cat).load_table

    def flaky(self, ident):
        raise OSError("database is locked")  # sqlite-busy shape

    monkeypatch.setattr(type(cat), "load_table", flaky)
    assert gc_settled_transactions(cat, grace_s=0.0) == 0
    assert len(os.listdir(d)) == n_before
    monkeypatch.setattr(type(cat), "load_table", orig)

    # a DROPPED table (KeyError) still counts as no-reference: seal the
    # other head path by committing, then GC proceeds
    cat.load_table("db.fact").append(_df(spark, [(9, "f9")]))
    assert gc_settled_transactions(cat, grace_s=0.0) == 1
    assert os.listdir(d) == []
