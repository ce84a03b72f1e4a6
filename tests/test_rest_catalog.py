"""REST catalog shim (lake/rest.py): the lake battery driven through an
HTTP client against a localhost server — the network-facing version of
the reference's JdbcCatalog role (LocalIcebergCatalog.java:133-135).
Commit authority is the SERVER's database-row CAS; clients see spec
status codes (404/409) surfaced as the same exceptions the in-process
catalogs raise, so every existing retry loop works unchanged."""

import threading

import pytest
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from icebergplus_spark.lake import compact
from icebergplus_spark.lake.commitio import ConcurrentCommitError
from icebergplus_spark.lake.rest import LakeRestServer, RestLakeCatalog

SCHEMA = StructType(
    [StructField("k", IntegerType(), True), StructField("v", StringType(), True)]
)


@pytest.fixture()
def server(tmp_path):
    srv = LakeRestServer(str(tmp_path / "wh")).start()
    yield srv
    srv.stop()


def _client(spark, server):
    return RestLakeCatalog(spark, server.base_url).start()


def _df(spark, rows):
    # driver-held rows: appends of this frame take the r12 driver-write
    # gate (no Spark write job per tiny append)
    from icebergplus_spark.localrel import local_rows_df

    return local_rows_df(spark, rows, SCHEMA)


def test_roundtrip_over_http(spark, server):
    cat = _client(spark, server)
    t = cat.create_table("db.t", SCHEMA)
    t = t.append(_df(spark, [(1, "a"), (2, "b")]))
    t = t.append(_df(spark, [(3, "c")]))
    assert t.scan().count() == 3
    assert cat.load_table("db.t").scan().count() == 3
    assert cat.list_tables() == ["db.t"]
    assert cat.list_namespaces() == ["db"]
    assert cat.table_exists("db.t") and not cat.table_exists("db.x")


def test_second_client_sees_state(spark, server):
    """Restartability over HTTP: a FRESH client instance (new config
    fetch, new commit IO) sees everything the first one committed."""
    cat = _client(spark, server)
    cat.create_table("db.t", SCHEMA).append(_df(spark, [(1, "a")]))
    cat2 = _client(spark, server)
    assert cat2.load_table("db.t").scan().count() == 1
    cat2.load_table("db.t").append(_df(spark, [(2, "b")]))
    assert cat.load_table("db.t").scan().count() == 2


def test_create_conflict_and_missing_table_status_codes(spark, server):
    cat = _client(spark, server)
    cat.create_table("db.t", SCHEMA)
    with pytest.raises(ValueError, match="already exists"):
        cat.create_table("db.t", SCHEMA)
    with pytest.raises(KeyError, match="no such table"):
        cat.load_table("db.nope")
    with pytest.raises(KeyError):
        cat.drop_table("db.nope")


def test_drop_table_over_http(spark, server):
    import os

    cat = _client(spark, server)
    t = cat.create_table("db.t", SCHEMA)
    t.append(_df(spark, [(1, "a")]))
    table_dir = t.table_dir
    cat.drop_table("db.t")
    assert not cat.table_exists("db.t")
    assert os.path.isdir(table_dir)  # drop without purge keeps files
    t2 = cat.create_table("db.u", SCHEMA)
    t2.append(_df(spark, [(1, "a")]))
    cat.drop_table("db.u", purge=True)
    assert not os.path.isdir(t2.table_dir)


def test_cas_loser_gets_concurrent_commit_error_through_http(spark, server):
    """Spec CommitFailedException (HTTP 409) surfaces as the same
    ConcurrentCommitError the in-process IOs raise."""
    cat = _client(spark, server)
    t1 = cat.create_table("db.t", SCHEMA)
    t1.append(_df(spark, [(1, "a")]))
    t2 = cat.load_table("db.t")
    t1.append(_df(spark, [(2, "b")]))  # advances the service row
    with pytest.raises(ConcurrentCommitError):
        t2.io.publish(t2._meta_dir, t2._meta["_phys_version"] + 1, "{}")
    t2.refresh().append(_df(spark, [(3, "c")]))
    assert t2.scan().count() == 3


def test_compaction_and_maintenance_through_http(spark, server):
    cat = _client(spark, server)
    t = cat.create_table("db.t", SCHEMA)
    for i in range(4):
        t.append(_df(spark, [(i, f"r{i}")]).coalesce(1))
    rep = compact(t, target_file_size=256 * 1024 * 1024)
    assert rep["compacted"] == 4
    assert cat.load_table("db.t").scan().count() == 4


def test_multi_table_transaction_through_http(spark, server):
    """txn.py's atomic multi-table commit with every metadata publish
    CASed through the REST service."""
    cat = _client(spark, server)
    cat.create_table("db.fact", SCHEMA)
    cat.create_table("db.dim", SCHEMA)
    with cat.transaction() as txn:
        txn.append("db.fact", _df(spark, [(1, "f"), (2, "f")]))
        txn.append("db.dim", _df(spark, [(1, "d")]))
    assert cat.load_table("db.fact").scan().count() == 2
    assert cat.load_table("db.dim").scan().count() == 1


def test_parallel_writers_no_lost_snapshots_over_http(spark, server):
    """The no-lost-snapshot battery through HTTP: two client catalog
    instances (= two hosts against one catalog service) racing appends;
    every append lands exactly once."""
    cat1 = _client(spark, server)
    cat1.create_table("db.shared", SCHEMA)
    cat2 = _client(spark, server)

    per_writer = 4
    errors: list[Exception] = []

    def writer(cat, base):
        try:
            t = cat.load_table("db.shared")
            for i in range(per_writer):
                for _ in range(8):
                    try:
                        t.append(_df(spark, [(base + i, f"w{base + i}")]))
                        break
                    except ConcurrentCommitError:
                        t.refresh()
                else:
                    raise RuntimeError("append never landed")
        except Exception as e:  # pragma: no cover - surfaced by assert
            errors.append(e)

    th1 = threading.Thread(target=writer, args=(cat1, 0))
    th2 = threading.Thread(target=writer, args=(cat2, 100))
    th1.start(), th2.start()
    th1.join(), th2.join()
    assert not errors, errors

    final = cat1.load_table("db.shared")
    appends = [
        s for s in final._meta["snapshots"] if s["operation"] == "append"
    ]
    assert len(appends) == 2 * per_writer
    rows = final.scan().collect()
    assert sorted(r["k"] for r in rows) == sorted(
        list(range(per_writer)) + list(range(100, 100 + per_writer))
    )


def test_server_adopts_preexisting_warehouse(spark, tmp_path):
    """Mount an EXISTING warehouse (written by the in-process catalog)
    over HTTP: the service seeds versions from a directory list, then
    becomes the commit authority for new writes."""
    from icebergplus_spark.lake import LocalLakeCatalog

    root = str(tmp_path / "wh")
    plain = LocalLakeCatalog(spark, root).start()
    plain.create_table("db.old", SCHEMA).append(_df(spark, [(1, "a")]))
    plain.stop()
    srv = LakeRestServer(root).start()
    try:
        cat = _client(spark, srv)
        t = cat.load_table("db.old")
        assert t.scan().count() == 1
        t.append(_df(spark, [(2, "b")]))
        assert cat.load_table("db.old").scan().count() == 2
    finally:
        srv.stop()


def test_time_travel_and_schema_evolution_through_http(spark, server):
    cat = _client(spark, server)
    t = cat.create_table("db.t", SCHEMA)
    t = t.append(_df(spark, [(1, "a")]))
    v1 = t.current_snapshot_id
    t = t.append(_df(spark, [(2, "b")]))
    assert t.scan(snapshot_id=v1).count() == 1
    t = t.rename_column("v", "label")
    got = cat.load_table("db.t")
    assert "label" in [f.name for f in got.schema.fields]
    assert got.scan().count() == 2


def test_versioned_views_over_http(spark, server):
    """Iceberg view-spec over the shim: versioned definitions live on
    the server; evaluation happens on the CLIENT's engine."""
    cat = _client(spark, server)
    t = cat.create_table("db.t", SCHEMA)
    t.append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    t.to_view("rest_t")
    cat.create_view("db.big_k", "SELECT k FROM rest_t WHERE k >= 2")
    assert cat.view_exists("db.big_k") and not cat.view_exists("db.nope")
    assert cat.list_views() == ["db.big_k"]
    assert sorted(r.k for r in cat.load_view("db.big_k").collect()) == [2, 3]
    # CREATE OR REPLACE appends a version; history stays loadable
    cat.create_view("db.big_k", "SELECT k FROM rest_t WHERE k >= 3", replace=True)
    assert [v["version"] for v in cat.view_versions("db.big_k")] == [1, 2]
    assert [r.k for r in cat.load_view("db.big_k").collect()] == [3]
    assert sorted(
        r.k for r in cat.load_view("db.big_k", version=1).collect()
    ) == [2, 3]
    # duplicate create without replace → 409 → ValueError
    with pytest.raises(ValueError):
        cat.create_view("db.big_k", "SELECT 1")
    cat.drop_view("db.big_k")
    assert cat.list_views() == []
    with pytest.raises(KeyError):
        cat.drop_view("db.big_k")


def test_materialized_aggregate_over_rest_catalog(spark, server):
    """The generalized MV composes with the HTTP catalog: spec-create,
    refresh, and staleness all route their metadata commits through
    the REST service."""
    import pyspark.sql.functions as F

    from icebergplus_spark.lake.rollup import (
        create_materialized_aggregate,
        mv_staleness,
        refresh_materialized,
    )

    cat = _client(spark, server)
    src_schema = spark.createDataFrame(
        [], "ts timestamp, grp string, x double"
    ).schema
    src = cat.create_table("db.src", src_schema)
    rows = [(f"2024-02-0{d} 0{h}:15:00", g, float(d * h)) for d in (1, 2) for h in range(3) for g in ("a", "b")]
    batch = spark.createDataFrame(rows, "ts string, grp string, x double").select(
        F.col("ts").cast("timestamp"), "grp", "x"
    )
    src.append(batch)
    create_materialized_aggregate(
        cat,
        "db.mv",
        "db.src",
        {"time_col": "ts", "window": "day", "group_cols": ["grp"],
         "aggs": [("n", "count(*)"), ("sx", "round(sum(x), 2)")]},
    )
    refresh_materialized(cat, "db.mv")
    assert mv_staleness(cat, "db.mv") == 0
    got = {
        (str(r.bucket), r.grp): (r.n, r.sx)
        for r in cat.load_table("db.mv").scan().collect()
    }
    want = {
        (str(r.bucket), r.grp): (r.n, r.sx)
        for r in src.scan()
        .groupBy(F.date_trunc("day", "ts").alias("bucket"), "grp")
        .agg(F.expr("count(*)").alias("n"), F.expr("round(sum(x), 2)").alias("sx"))
        .collect()
    }
    assert got == want and len(got) == 4


def test_server_restart_same_warehouse(spark, tmp_path):
    """Catalog-service availability semantics: with the server down a
    write fails loudly (no silent local fallback — the commit authority
    is gone); a NEW server instance over the same warehouse restores
    service and the client's retry lands, nothing lost or duplicated."""
    import urllib.error

    srv = LakeRestServer(str(tmp_path / "whrs")).start()
    port = int(srv.base_url.rsplit(":", 1)[1])
    cat = _client(spark, srv)
    t = cat.create_table("db.t", SCHEMA)
    t.append(_df(spark, [(1, "a")]))
    srv.stop()
    with pytest.raises((urllib.error.URLError, RuntimeError, OSError)):
        t.append(_df(spark, [(2, "b")]))
    srv2 = LakeRestServer(str(tmp_path / "whrs"), port=port).start()
    try:
        t.refresh()
        t.append(_df(spark, [(2, "b")]))
        assert sorted(r.k for r in t.scan().collect()) == [1, 2]
    finally:
        srv2.stop()


def test_inflight_txn_blocks_independent_writer_over_http(spark, server):
    """The staged-head write-intent guard holds over the wire: while a
    multi-table transaction's staged metadata sits at a table's head,
    an independent writer through a SECOND HTTP client is refused
    (ConcurrentCommitError) — and admitted after the txn commits."""
    cat = _client(spark, server)
    cat.create_table("db.a", SCHEMA)
    cat.create_table("db.b", SCHEMA)
    cat.load_table("db.a").append(_df(spark, [(1, "a")]))

    txn = cat.transaction(ttl_s=600)
    txn.append("db.a", _df(spark, [(2, "t")]))
    txn.append("db.b", _df(spark, [(3, "t")]))
    txn._begin()
    txn._stage_all()

    other = _client(spark, server)
    with pytest.raises(ConcurrentCommitError):
        other.load_table("db.a").append(_df(spark, [(9, "x")]))

    txn._publish()
    assert txn._state == "committed"
    t = other.load_table("db.a")
    t.append(_df(spark, [(9, "x")]))
    assert sorted(r.k for r in t.scan().collect()) == [1, 2, 9]
    assert other.load_table("db.b").scan().count() == 1


def test_metrics_relay_to_server(spark, server):
    """r6 (VERDICT r5 #4): a client commit/scan relays its
    CommitReport/ScanReport to POST .../tables/{t}/metrics and the
    exact 11 commit meter names (plus the scan meters) materialize in
    the SERVER's registry — the reference's deployment shape, where
    the service owns the Micrometer registry
    (MicrometerMetricsReporter.java:51-72; IntegrationTest.java:106-117
    asserts the same names end-to-end)."""
    from icebergplus_spark.lake.metrics import (
        COMMIT_COUNTER_FIELDS,
        COMMIT_TIMER_FIELDS,
        SCAN_COUNTER_FIELDS,
        SCAN_TIMER_FIELDS,
    )

    cat = _client(spark, server)
    t = cat.create_table("db.metr", SCHEMA)
    t = t.append(_df(spark, [(1, "a"), (2, "b")]))
    t.plan_files()  # emits a ScanReport
    cat._reporter.flush()  # relay is async — drain before asserting
    names = server.metrics.meter_names
    for f in COMMIT_COUNTER_FIELDS + COMMIT_TIMER_FIELDS:
        assert f"iceberg.commitReport.{f}" in names, f
    for f in SCAN_COUNTER_FIELDS + SCAN_TIMER_FIELDS:
        assert f"iceberg.scanReport.{f}" in names, f
    # counters carry the tableName tag and real values
    c = server.metrics.get("iceberg.commitReport.addedRecords")
    assert c is not None and c.value == 2.0 and c.tags["tableName"] == "db.metr"
    # timers are untagged samples
    tm = server.metrics.get_timer("iceberg.commitReport.totalDuration")
    assert tm is not None and tm.count >= 1 and tm.total_time_s > 0


def test_quoted_table_names_round_trip(spark, server):
    """ADVICE r5: names with percent-encoded characters must resolve to
    the SAME identifier server-side (the server now unquotes the path
    segment)."""
    cat = _client(spark, server)
    name = "db.t with space+%"
    t = cat.create_table(name, SCHEMA)
    t.append(_df(spark, [(1, "a")]))
    assert cat.table_exists(name)
    assert cat.load_table(name).scan().count() == 1
    cat.drop_table(name)
    assert not cat.table_exists(name)


def test_concurrent_namespace_creates_not_lost(spark, server):
    """ADVICE r5: the namespace registry RMW is now locked — parallel
    createNamespace calls must all survive."""
    import threading

    cat = _client(spark, server)
    names = [f"ns{i}" for i in range(12)]
    errs = []

    def mk(n):
        try:
            cat.create_namespace(n)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=mk, args=(n,)) for n in names]
    [th.start() for th in threads]
    [th.join() for th in threads]
    assert not errs
    got = set(cat.list_namespaces())
    assert set(names) <= got


def test_rename_table_over_http(spark, server):
    """r6: renameTable (POST /v1/tables/rename) — identifier move only,
    data stays put; 404 for a missing source, 409 for an occupied
    destination, both surfaced as the local catalog's error types."""
    cat = _client(spark, server)
    t = cat.create_table("db.before", SCHEMA)
    t.append(_df(spark, [(1, "a"), (2, "b")]))
    t2 = cat.rename_table("db.before", "db2.after")
    assert t2.scan().count() == 2
    assert not cat.table_exists("db.before")
    assert cat.table_exists("db2.after")
    assert "db2" in cat.list_namespaces()
    # a second client sees the move (server is the authority)
    cat2 = _client(spark, server)
    assert cat2.load_table("db2.after").scan().count() == 2
    with pytest.raises(KeyError):
        cat.rename_table("db.before", "db.x")  # source gone
    cat.create_table("db.occupied", SCHEMA)
    with pytest.raises(ValueError):
        cat.rename_table("db2.after", "db.occupied")  # dest exists


def _post_json(url, payload):
    import json
    import urllib.request

    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    resp = urllib.request.urlopen(req, timeout=5)
    return resp.status


def test_metrics_report_snapshot_id_zero_and_malformed(server):
    """ADVICE r6 (rest.py reportMetrics): (a) a legitimate snapshot-id
    of 0 must not be coerced away and the report must register; (b) a
    malformed numeric payload must be DROPPED with 204 — observability
    never turns into a 500 on the data plane."""
    url = f"{server.base_url}/v1/namespaces/db/tables/mt/metrics"
    assert (
        _post_json(
            url,
            {
                "report-type": "scan-report",
                "snapshot-id": 0,
                "metrics": {"resultDataFiles": 3},
                "timers": {"totalPlanningDuration": 0.01},
            },
        )
        == 204
    )
    c = server.metrics.get("iceberg.scanReport.resultDataFiles")
    assert c is not None and c.value == 3.0
    # malformed values: non-numeric metric, non-numeric snapshot-id
    for bad in (
        {"report-type": "scan-report", "metrics": {"resultDataFiles": "x"}},
        {"report-type": "commit-report", "snapshot-id": "not-a-number"},
        {"report-type": "commit-report", "metrics": {"attempts": None}},
    ):
        assert _post_json(url, bad) == 204
    # the malformed reports were dropped, not partially applied
    assert server.metrics.get("iceberg.commitReport.attempts") is None


def test_rename_to_bare_identifier_no_empty_namespace(spark, server):
    """ADVICE r6: renaming to a namespace-less destination must not
    register the empty string in the namespace registry."""
    cat = _client(spark, server)
    cat.create_table("db.src", SCHEMA).append(_df(spark, [(1, "a")]))
    cat.rename_table("db.src", "bare")
    # the client normalizes a bare identifier to its 'default'
    # namespace (same as create_table); the server must NOT register
    # the empty string even for raw API callers
    assert cat.table_exists("bare")
    assert cat.load_table("bare").scan().count() == 1
    assert "" not in cat.list_namespaces()
    # raw API call with an empty namespace list: server-side guard
    import urllib.request, json as _json
    req = urllib.request.Request(
        f"{server.base_url}/v1/tables/rename",
        data=_json.dumps({
            "source": {"namespace": ["default"], "name": "bare"},
            "destination": {"namespace": [], "name": "rawbare"},
        }).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    assert urllib.request.urlopen(req, timeout=5).status == 204
    assert "" not in cat.list_namespaces()


def test_relay_flush_covers_inflight_post(server):
    """ADVICE r6: RestRelayReporter.flush must wait for the IN-FLIGHT
    POST, not just an empty queue — a slow collector previously let
    flush return while the last report was still on the wire."""
    from icebergplus_spark.lake.metrics import ScanReport
    from icebergplus_spark.lake.rest import RestRelayReporter

    # throttle the server: first byte of handling delayed via a slow
    # socket is fiddly, so instead serialize through the real server but
    # enqueue MANY reports — with the old empty()+0.05s flush the tail
    # reports were regularly unseen; with unfinished_tasks they all are.
    rep = RestRelayReporter(server.base_url)
    n = 40
    for i in range(n):
        rep.report(
            ScanReport(
                table_name="db.fl",
                snapshot_id=i,
                metrics={"resultDataFiles": 1.0},
                timers={},
            )
        )
    rep.flush(timeout_s=30.0)
    assert rep._q.unfinished_tasks == 0
    c = server.metrics.get("iceberg.scanReport.resultDataFiles")
    assert c is not None and c.value == float(n)


def test_list_pagination_round_trip(spark, server):
    """r7 (VERDICT r6 #5): Iceberg REST pageToken pagination. The
    server slices listings by pageSize/pageToken; the client follows
    next-page-token (page size forced tiny here) and reassembles the
    COMPLETE namespace/table/view lists."""
    import json as _json
    import urllib.request

    cat = _client(spark, server)
    names = [f"db.t{i:03d}" for i in range(12)]
    for n in names:
        cat.create_table(n, SCHEMA)
    cat.create_view("db.v1", "SELECT 1 AS one")
    cat.create_view("db.v2", "SELECT 2 AS two")
    for i in range(7):
        cat.create_namespace(f"extra{i}")

    # raw protocol: one page of 5 + a token, then the rest
    with urllib.request.urlopen(
        f"{server.base_url}/v1/namespaces/db/tables?pageSize=5", timeout=5
    ) as r:
        p1 = _json.loads(r.read())
    assert len(p1["identifiers"]) == 5
    tok = p1["next-page-token"]
    assert tok
    with urllib.request.urlopen(
        f"{server.base_url}/v1/namespaces/db/tables"
        f"?pageSize=50&pageToken={tok}",
        timeout=5,
    ) as r:
        p2 = _json.loads(r.read())
    assert len(p2["identifiers"]) == 7
    assert "next-page-token" not in p2
    got = {
        ".".join(i["namespace"]) + "." + i["name"]
        for i in p1["identifiers"] + p2["identifiers"]
    }
    assert got == set(names)

    # client reassembly under a tiny page size — every list complete
    cat.LIST_PAGE_SIZE = 3
    assert cat.list_tables("db") == sorted(names)
    assert set(cat.list_namespaces()) >= {"db", *{f"extra{i}" for i in range(7)}}
    assert cat.list_views("db") == ["db.v1", "db.v2"]
    # no pageSize param → whole list in one response (back-compat)
    with urllib.request.urlopen(
        f"{server.base_url}/v1/namespaces/db/tables", timeout=5
    ) as r:
        whole = _json.loads(r.read())
    assert len(whole["identifiers"]) == 12 and "next-page-token" not in whole


def test_relay_drop_counter_under_hung_collector(server):
    """r7 (VERDICT r6 #5): a dead/hung collector must cost COUNTED
    drops — full-queue rejections and failed deliveries both increment
    dropped_reports and the local sink's relay.droppedReports counter;
    close() drains within its bound and never hangs."""
    import time

    from icebergplus_spark.lake.metrics import MetricsSink, ScanReport
    from icebergplus_spark.lake.rest import RestRelayReporter

    sink = MetricsSink()
    # point at a dead port: every delivery fails fast (conn refused)
    rep = RestRelayReporter("http://127.0.0.1:9", sink)
    for i in range(5):
        rep.report(
            ScanReport("db.x", i, {"resultDataFiles": 1.0}, {})
        )
    t0 = time.time()
    rep.close(timeout_s=10.0)
    assert time.time() - t0 < 10.0
    assert rep.dropped_reports == 5
    c = sink.get("iceberg.relay.droppedReports")
    assert c is not None and c.value == 5.0

    # full-queue rejection path: shrink the queue and saturate it with
    # a worker that can't drain (unroutable address hangs on connect)
    rep2 = RestRelayReporter("http://10.255.255.1:9", MetricsSink())
    rep2.RELAY_QUEUE_MAX = 2
    rep2._q.maxsize = 2
    for i in range(10):
        rep2.report(ScanReport("db.y", i, {"resultDataFiles": 1.0}, {}))
    assert rep2.dropped_reports >= 7  # ≥10 - queue(2) - in-flight(1)


def test_select_makes_no_catalog_listing_calls(spark, server):
    """r8 (VERDICT r7 wrong #1): the generic SELECT path (joins fall
    back to it) must NOT list the catalog — candidates come from the
    identifiers in the statement, one load attempt each. On a
    100k-table REST catalog a listing per statement is a namespace
    fan-out of HTTP calls and the statement's dominant cost."""
    from icebergplus_spark.lake.sql_dml import lake_sql

    cat = _client(spark, server)
    fact = cat.create_table("db.fact", SCHEMA)
    dim = cat.create_table("db.dim", SCHEMA)
    fact.append(_df(spark, [(1, "x"), (2, "y"), (3, "z")]))
    dim.append(_df(spark, [(1, "one"), (2, "two")]))

    reqs = []
    orig = server._handle

    def spy(method, path, query, body):
        reqs.append((method, path))
        return orig(method, path, query, body)

    server._handle = spy
    got = sorted(
        (r["k"], r["dv"])
        for r in lake_sql(
            cat,
            "SELECT f.k AS k, d.v AS dv "
            "FROM db.fact f JOIN db.dim d ON f.k = d.k",
        ).collect()
    )
    assert got == [(1, "one"), (2, "two")]
    listings = [
        (m, p)
        for m, p in reqs
        if m == "GET"
        and (p.rstrip("/").endswith("/tables") or p.rstrip("/") == "/v1/namespaces")
    ]
    assert listings == [], f"catalog listings during SELECT: {listings}"
    # and the loads are bounded by the statement's identifiers, not
    # catalog size: db.fact, db.dim (+ alias.col probes f.k/d.k/d.v)
    loads = [(m, p) for m, p in reqs if m == "GET" and "/tables/" in p]
    assert 0 < len(loads) <= 8, loads


def test_metadata_table_pagination_round_trip(spark, server):
    """r8 (VERDICT r7 #7): metadata-table reads over REST paginate with
    the same pageToken protocol as listings — raw protocol past the
    page size for a driver-side kind (snapshots) and the manifest-fed
    `files` kind, then the client reassembles complete row sets."""
    import json as _json
    import urllib.request

    cat = _client(spark, server)
    t = cat.create_table("db.meta", SCHEMA)
    for i in range(12):  # 12 snapshots, 12 files
        t.append(_df(spark, [(i, f"v{i}")]).coalesce(1))

    # raw protocol: one page of 5 + a token, then the rest
    base = f"{server.base_url}/v1/namespaces/db/tables/meta/metadata"
    with urllib.request.urlopen(
        f"{base}/snapshots?pageSize=5", timeout=5
    ) as r:
        p1 = _json.loads(r.read())
    assert len(p1["rows"]) == 5
    tok = p1["next-page-token"]
    with urllib.request.urlopen(
        f"{base}/snapshots?pageSize=50&pageToken={tok}", timeout=5
    ) as r:
        p2 = _json.loads(r.read())
    assert len(p2["rows"]) == 7
    assert "next-page-token" not in p2

    # client reassembly equals the direct metadata_df view
    rows = cat.metadata_rows("db.meta", "snapshots")
    assert len(rows) == 12
    assert [r["snapshot_id"] for r in rows] == [
        r["snapshot_id"]
        for r in t.metadata_df("snapshots").collect()
    ]
    files = cat.metadata_rows("db.meta", "files")
    assert len(files) == 12
    assert {f["file_path"] for f in files} == {
        f["file_path"] for f in t.plan_files()
    }
    hist = cat.metadata_rows("db.meta", "history")
    assert len(hist) == 12 and hist[-1]["is_current"]

    # unknown kind is a loud 404, not an empty list
    import urllib.error

    with pytest.raises(urllib.error.HTTPError):
        urllib.request.urlopen(f"{base}/nonsense?pageSize=5", timeout=5)


def test_files_pagination_pins_snapshot(spark, server):
    """r8 self-review: a commit landing mid-pagination must not shear
    page offsets — the files token pins the snapshot id, and snapshots
    are immutable, so the reassembled set equals the pinned snapshot's
    inventory exactly."""
    import json as _json
    import urllib.request

    cat = _client(spark, server)
    t = cat.create_table("db.pin", SCHEMA)
    for i in range(8):
        t.append(_df(spark, [(i, f"v{i}")]).coalesce(1))
    pinned_files = {f["file_path"] for f in t.plan_files()}

    base = f"{server.base_url}/v1/namespaces/db/tables/pin/metadata"
    with urllib.request.urlopen(f"{base}/files?pageSize=3", timeout=5) as r:
        p1 = _json.loads(r.read())
    assert len(p1["rows"]) == 3
    tok = p1["next-page-token"]
    # a NEW commit lands between pages
    t.append(_df(spark, [(99, "late")]).coalesce(1))
    got = {row["file_path"] for row in p1["rows"]}
    while tok:
        with urllib.request.urlopen(
            f"{base}/files?pageSize=3&pageToken={tok}", timeout=5
        ) as r:
            p = _json.loads(r.read())
        got.update(row["file_path"] for row in p["rows"])
        tok = p.get("next-page-token")
    # exactly the pinned snapshot's 8 files — the late file excluded,
    # nothing duplicated or dropped
    assert got == pinned_files


def test_full_name_qualified_columns_cost_no_extra_loads(spark, server):
    """ADVICE r8 (low): `FROM db.t WHERE db.t.k > 1` — the qualified
    column ref db.t.k must not trigger its own (guaranteed-404) load
    attempt once db.t has resolved; each such ref was one HTTP round
    trip on the REST catalog."""
    from icebergplus_spark.lake.sql_dml import lake_sql

    cat = _client(spark, server)
    t = cat.create_table("db.qt", SCHEMA)
    t.append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))

    reqs = []
    orig = server._handle

    def spy(method, path, query, body):
        reqs.append((method, path))
        return orig(method, path, query, body)

    server._handle = spy
    got = sorted(
        r["k"]
        for r in lake_sql(
            cat,
            "SELECT db.qt.k AS k, db.qt.v AS v FROM db.qt "
            "WHERE db.qt.k > 1",
        ).collect()
    )
    assert got == [2, 3]
    misses = [
        (m, p)
        for m, p in reqs
        if m == "GET" and p.rstrip("/").endswith("/tables/qt.k")
        or p.rstrip("/").endswith("/tables/qt.v")
    ]
    assert misses == [], f"qualified column refs hit the catalog: {misses}"


def test_entries_partitions_and_audit_kinds_over_rest(spark, server):
    """r9 (VERDICT r8 #5): the metadata kinds maintenance tooling reads
    most — `entries` (incremental pages, version-pinned token) and
    `partitions` — plus the audit `all_files` family and every moved
    spark-free kind, each equal to the local metadata_df view."""
    import json as _json
    import urllib.request

    cat = _client(spark, server)
    t = cat.create_table("db.kinds", SCHEMA, partition_cols=["v"])
    for i in range(6):
        t.append(_df(spark, [(i, f"p{i % 2}"), (100 + i, f"p{i % 2}")]))
    base = f"{server.base_url}/v1/namespaces/db/tables/kinds/metadata"

    # --- entries: raw pagination past the page size ---
    with urllib.request.urlopen(f"{base}/entries?pageSize=7", timeout=5) as r:
        p1 = _json.loads(r.read())
    assert len(p1["rows"]) == 7 and p1["next-page-token"]
    got = list(p1["rows"])
    tok = p1["next-page-token"]
    while tok:
        with urllib.request.urlopen(
            f"{base}/entries?pageSize=7&pageToken={tok}", timeout=5
        ) as r:
            p = _json.loads(r.read())
        got.extend(p["rows"])
        tok = p.get("next-page-token")
    want = [
        r.asDict() for r in t.metadata_df("entries").collect()
    ]
    key = lambda e: (e["snapshot_id"], e["file_path"], e["status"])
    assert sorted(map(key, got)) == sorted(map(key, want))
    # ADDED on the birth snapshot, EXISTING later
    assert {e["status"] for e in got} == {0, 1}

    # --- client reassembly for every kind vs local metadata_df ---
    for kind in (
        "entries",
        "all_files",
        "all_manifests",
        "delete_files",
        "deletion_vectors",
        "metadata_log_entries",
        "statistics",
    ):
        rows = cat.metadata_rows("db.kinds", kind)
        local = t.metadata_df(kind).collect()
        assert len(rows) == len(local), kind

    # --- partitions: aggregated rows equal the distributed view ---
    prows = cat.metadata_rows("db.kinds", "partitions")
    want_p = {
        (r["partition"], r["file_count"], r["record_count"])
        for r in t.metadata_df("partitions").collect()
    }
    assert {
        (r["partition"], r["file_count"], r["record_count"]) for r in prows
    } == want_p and len(prows) == 2


def test_entries_pagination_pins_metadata_version(spark, server):
    """A commit landing mid-pagination must not shear entries pages:
    the token pins the metadata VERSION, whose snapshot list is
    immutable on disk."""
    import json as _json
    import urllib.request

    cat = _client(spark, server)
    t = cat.create_table("db.epin", SCHEMA)
    for i in range(6):
        t.append(_df(spark, [(i, f"v{i}")]).coalesce(1))
    # entries at this version: 6+5+4+3+2+1 = 21 (snapshot n sees n files)
    base = f"{server.base_url}/v1/namespaces/db/tables/epin/metadata"
    with urllib.request.urlopen(f"{base}/entries?pageSize=4", timeout=5) as r:
        p1 = _json.loads(r.read())
    tok = p1["next-page-token"]
    t.append(_df(spark, [(99, "late")]).coalesce(1))  # version moves on
    got = list(p1["rows"])
    while tok:
        with urllib.request.urlopen(
            f"{base}/entries?pageSize=4&pageToken={tok}", timeout=5
        ) as r:
            p = _json.loads(r.read())
        got.extend(p["rows"])
        tok = p.get("next-page-token")
    assert len(got) == 21  # the late commit's entries excluded
    assert len({(e["snapshot_id"], e["file_path"]) for e in got}) == 21
