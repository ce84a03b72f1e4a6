"""LocalLakeCatalog — restartable local catalog over a warehouse dir.

Parity with the reference's ``LocalIcebergCatalog`` (SURVEY.md §2.A rows
1-3, 6-7): the reference boots a MinIO container + embedded H2 JDBC
catalog (LocalIcebergCatalog.java:99-142); Spark-native needs neither —
the warehouse is a directory (local fs in tests, s3a:// on a cluster)
and the "catalog database" is a ``_catalog/`` directory of JSON pointer
files. Restartability (LocalIcebergCatalogTest.java:114-156) falls out:
state is all on disk, a new instance over the same dir sees every table.

Concurrency stance: pointer updates are atomic renames — safe for a
single writer per table, the same guarantee the reference's H2-backed
CAS gives in-process. The 100 TB/multi-writer upgrade point is a real
CAS (DynamoDB/JDBC catalog), isolated behind this class.
"""

from __future__ import annotations

import json
import shutil
import os
from enum import Enum

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from icebergplus_spark.lake.commitio import RenameCommitIO
from icebergplus_spark.lake.metrics import MetricsReporter, MetricsSink
from icebergplus_spark.lake.table import LakeTable


class Status(Enum):  # LocalIcebergCatalog.java:40-46 state machine
    STOPPED = "STOPPED"
    STARTING = "STARTING"
    STARTED = "STARTED"


class LocalLakeCatalog:
    def __init__(
        self,
        spark: SparkSession,
        root_dir: str,
        metrics_sink: MetricsSink | None = None,
        prefix: str = "iceberg.",
        commit_io: "RenameCommitIO | None" = None,
    ) -> None:
        self.spark = spark
        self.root_dir = root_dir
        self._status = Status.STOPPED
        self._reporter = MetricsReporter(metrics_sink, prefix)
        # Metadata-publication strategy shared by every table this
        # catalog hands out (commitio.py): RenameCommitIO for POSIX
        # warehouses, ObjectStoreCommitIO for rename-less object stores
        # — the reference's S3FileIO-vs-local split
        # (LocalIcebergCatalog.java:87-97,120-131) as a constructor arg.
        self.commit_io = commit_io or RenameCommitIO()

    # -- lifecycle (LocalIcebergCatalog.java:99-141, :174-187) -------------
    def start(self) -> "LocalLakeCatalog":
        if self._status is not Status.STOPPED:  # CAS guard parity
            raise RuntimeError(f"catalog not stopped: {self._status}")
        self._status = Status.STARTING
        os.makedirs(self._catalog_dir, exist_ok=True)
        # Idempotent transaction recovery (txn.py): expired in-flight
        # multi-table transactions are aborted via their final-file CAS
        # so a crashed coordinator can never wedge its tables.
        from icebergplus_spark.lake.txn import recover_transactions

        self.recovered_txns = recover_transactions(self)
        self._status = Status.STARTED
        return self

    def transaction(self, ttl_s: float = 600.0):
        """Open a multi-table write transaction (txn.py): buffered
        append/overwrite/delete/update_where calls against any of this
        catalog's tables commit atomically — readers see all staged
        versions or none, decided by one create-if-absent CAS."""
        self._require_started()
        from icebergplus_spark.lake.txn import LakeTransaction

        return LakeTransaction(self, ttl_s=ttl_s)

    def stop(self) -> None:
        # All state is on disk already — stop only flips the gate, like
        # the reference stopping MinIO but keeping its data dir.
        self._status = Status.STOPPED

    def is_stopped(self) -> bool:
        return self._status is Status.STOPPED

    def set_metrics_reporter(self, reporter: MetricsReporter) -> None:
        """Direct injection — no reflection needed (SURVEY.md §2.A row 5)."""
        self._reporter = reporter

    # -- catalog operations ------------------------------------------------
    @property
    def _catalog_dir(self) -> str:
        return os.path.join(self.root_dir, "_catalog")

    def _pointer_file(self, identifier: str) -> str:
        return os.path.join(self._catalog_dir, f"{identifier}.json")

    def _require_started(self) -> None:
        if self._status is not Status.STARTED:
            raise RuntimeError("catalog is not started")

    def _pointer_kind(self, identifier: str) -> str | None:
        """'table' | 'view' | None — what the catalog entry is."""
        try:
            with open(self._pointer_file(identifier)) as f:
                return json.load(f).get("kind", "table")
        except OSError:
            return None

    def list_tables(self, namespace: str | None = None) -> list[str]:
        self._require_started()
        out = []
        for fn in sorted(os.listdir(self._catalog_dir)):
            if fn.endswith(".json"):
                ident = fn[: -len(".json")]
                if (
                    namespace is None or ident.startswith(namespace + ".")
                ) and self._pointer_kind(ident) == "table":
                    out.append(ident)
        return out

    def table_exists(self, identifier: str) -> bool:
        self._require_started()
        return self._pointer_kind(identifier) == "table"

    # -- catalog-persisted versioned views (Iceberg view spec parity) ------
    def create_view(
        self, identifier: str, sql_text: str, replace: bool = False
    ) -> None:
        """Register a SQL view as a CATALOG object with a version log
        (Iceberg views: the definition is versioned metadata — CREATE OR
        REPLACE appends a version, never loses history; the view shares
        the tables' namespace, so names cannot collide)."""
        self._require_started()
        kind = self._pointer_kind(identifier)
        if kind == "table":
            raise ValueError(f"a table already exists at: {identifier}")
        if kind == "view" and not replace:
            raise ValueError(f"view already exists: {identifier} (use replace=True)")
        import time as _time

        meta = (
            json.load(open(self._pointer_file(identifier)))
            if kind == "view"
            else {"kind": "view", "versions": []}
        )
        version = len(meta["versions"]) + 1
        meta["versions"].append(
            {
                "version": version,
                "sql": sql_text,
                "timestamp_ms": int(_time.time() * 1000),
            }
        )
        meta["current_version"] = version
        with open(self._pointer_file(identifier), "w") as f:
            json.dump(meta, f, indent=1)

    def view_exists(self, identifier: str) -> bool:
        self._require_started()
        return self._pointer_kind(identifier) == "view"

    def list_views(self, namespace: str | None = None) -> list[str]:
        self._require_started()
        return [
            fn[: -len(".json")]
            for fn in sorted(os.listdir(self._catalog_dir))
            if fn.endswith(".json")
            and (namespace is None or fn.startswith(namespace + "."))
            and self._pointer_kind(fn[: -len(".json")]) == "view"
        ]

    def load_view(self, identifier: str, version: int | None = None):
        """Evaluate the view at its current (or a historical) version —
        returns the DataFrame of ``spark.sql(definition)``. Referenced
        tables resolve through the session (``LakeTable.to_view`` them
        first), exactly like Iceberg views referencing catalog tables."""
        self._require_started()
        if self._pointer_kind(identifier) != "view":
            raise KeyError(f"no such view: {identifier}")
        with open(self._pointer_file(identifier)) as f:
            meta = json.load(f)
        version = version or meta["current_version"]
        entry = next(
            (v for v in meta["versions"] if v["version"] == version), None
        )
        if entry is None:
            raise KeyError(f"view {identifier} has no version {version}")
        return self.spark.sql(entry["sql"])

    def view_versions(self, identifier: str) -> list[dict]:
        self._require_started()
        if self._pointer_kind(identifier) != "view":
            raise KeyError(f"no such view: {identifier}")
        with open(self._pointer_file(identifier)) as f:
            return json.load(f)["versions"]

    def drop_view(self, identifier: str) -> None:
        self._require_started()
        if self._pointer_kind(identifier) != "view":
            raise KeyError(f"no such view: {identifier}")
        os.remove(self._pointer_file(identifier))

    def create_table(
        self,
        identifier: str,
        schema: StructType,
        partition_cols: list[str] | None = None,
        partition_spec: list[str] | None = None,
        bloom_cols: list[str] | None = None,
    ) -> LakeTable:
        """createTable parity (LocalIcebergCatalogTest.java:75): registers
        schema (+ generated Iceberg-style field IDs) and an empty
        snapshot log, then drops the catalog pointer in place.

        ``partition_spec`` accepts Iceberg-style transform entries —
        ``["days(ts)", "bucket(8, user_id)", "truncate(3, code)",
        "region"]`` (hidden partitioning; PartitionSpec.builderFor
        parity). ``partition_cols`` is the identity-only shorthand.

        ``bloom_cols``: columns that get a per-file bloom filter in the
        manifest at write time, enabling plan-time file skipping for
        equality predicates on high-cardinality columns (stored under
        the columns' physical names, so it survives renames)."""
        from icebergplus_spark.lake.transforms import parse_spec

        self._require_started()
        if self._pointer_kind(identifier) is not None:
            raise ValueError(f"table or view already exists: {identifier}")
        if partition_cols and partition_spec:
            raise ValueError("pass partition_cols or partition_spec, not both")
        spec = parse_spec(partition_spec or partition_cols or [])
        names = {f.name for f in schema.fields}
        for f in spec:
            if f["source"] not in names:
                raise ValueError(f"partition source not in schema: {f['source']}")
        for c in bloom_cols or []:
            if c not in names:
                raise ValueError(f"bloom column not in schema: {c}")
        namespace, _, name = identifier.rpartition(".")
        table_dir = os.path.join(self.root_dir, namespace or "default", name)
        meta_dir = os.path.join(table_dir, "metadata")
        os.makedirs(meta_dir, exist_ok=True)
        meta = {
            "identifier": identifier,
            "schema": schema.jsonValue(),
            "field_ids": {f.name: i + 1 for i, f in enumerate(schema.fields)},
            "partition_cols": [
                f["source"] for f in spec if f["transform"] == "identity"
            ],
            "partition_spec": spec,
            "bloom_cols": list(bloom_cols or []),
            "snapshots": [],
            "current_snapshot_id": None,
        }
        self.commit_io.publish(meta_dir, 1, json.dumps(meta, indent=1))
        with open(self._pointer_file(identifier), "w") as f:
            json.dump({"table_dir": table_dir}, f)
        return self.load_table(identifier)

    def rename_table(self, old: str, new: str) -> LakeTable:
        """Iceberg ``Catalog.renameTable`` parity: identifier move only.
        The table location and every data/metadata file stay put (like
        Iceberg, where the identifier is a catalog pointer, not a path);
        the new identifier is recorded as a metadata version so the
        table is self-describing after the move."""
        self._require_started()
        if not self.table_exists(old):
            raise KeyError(f"no such table: {old}")
        if self._pointer_kind(new) is not None:
            raise ValueError(f"table or view already exists: {new}")
        self.load_table(old)._evolve(
            lambda meta: meta.__setitem__("identifier", new)
        )
        if getattr(self.commit_io, "atomic_rename", True):
            os.replace(self._pointer_file(old), self._pointer_file(new))
        else:
            # Object-store catalog db: copy-then-delete. Not atomic — a
            # concurrent reader can briefly see both names (never
            # neither: the new pointer lands first). Same non-atomic
            # rename window Iceberg's HadoopCatalog has on S3; the
            # upgrade point is a transactional catalog service (the
            # reference's JDBC/H2 role).
            shutil.copyfile(self._pointer_file(old), self._pointer_file(new))
            os.remove(self._pointer_file(old))
        return self.load_table(new)

    def clone_table(self, src_identifier: str, dst_identifier: str) -> LakeTable:
        """Zero-copy clone (Iceberg ``snapshot`` procedure parity): a new
        independent table referencing the source's data files in place —
        only the (small) manifest files are copied, no data moves; the
        full snapshot lineage is inherited so merge-on-read tombstone
        semantics and time travel behave exactly as in the source.
        Writes to either table diverge from the clone point. Like
        Iceberg snapshot tables, the clone is created with
        ``gc.enabled=false`` so its vacuum/expiry never deletes files
        the source still owns; compaction on the clone is safe
        (rewrites land in the clone's own directory).

        The hazard runs BOTH ways: the clone's inherited manifests
        reference files the SOURCE owns, so source-side
        ``expire_snapshots`` / ``remove_orphan_files`` could delete
        files a clone still reads (the failure mode Iceberg documents
        for snapshot tables). To prevent it, the clone is registered on
        the source as a ``clones`` table property and file-deleting
        maintenance REFUSES while it is set; after dropping a clone,
        ``unset_property("clones")`` (or remove its entry) re-enables
        maintenance.

        At 100 TB this is the experiment on-ramp: a full-table sandbox
        in O(manifests) time and bytes."""
        self._require_started()
        src = self.load_table(src_identifier)
        if self._pointer_kind(dst_identifier) is not None:
            raise ValueError(f"table or view already exists: {dst_identifier}")
        namespace, _, name = dst_identifier.rpartition(".")
        table_dir = os.path.join(self.root_dir, namespace or "default", name)
        meta_dir = os.path.join(table_dir, "metadata")
        os.makedirs(meta_dir, exist_ok=True)
        meta = {
            k: v
            for k, v in src._meta.items()
            # _phys bookkeeping and any (already-resolved) transaction
            # marker stay behind: the clone's metadata history starts at
            # v1, so a copied base_version would dangle
            if k not in ("_version", "_phys_version", "pending_txn", "base_version")
        }
        meta["identifier"] = dst_identifier
        meta["properties"] = {
            **(meta.get("properties") or {}),
            "gc.enabled": "false",
        }
        meta["refs"] = {}
        # The FULL snapshot lineage is inherited (all manifests copied —
        # still metadata-only). Squashing to one snapshot would reset
        # every file's birth snapshot and break equality-tombstone
        # applies_before semantics (deleted rows would resurrect in the
        # clone); as a bonus the clone can time-travel into inherited
        # history. gc.enabled=false already blocks expiry from deleting
        # inherited (source-owned) files.
        seen: set[str] = set()
        for snap in meta.get("snapshots", []):
            for m in list(snap["manifests"]) + list(
                snap.get("delete_manifests", [])
            ):
                if m not in seen:
                    seen.add(m)
                    shutil.copy2(
                        os.path.join(src._meta_dir, m), os.path.join(meta_dir, m)
                    )
        self.commit_io.publish(meta_dir, 1, json.dumps(meta, indent=1))
        with open(self._pointer_file(dst_identifier), "w") as f:
            json.dump({"table_dir": table_dir}, f)
        # register the clone on the SOURCE: its data files are now shared,
        # so source-side expiry/orphan-removal must refuse until the clone
        # registration is removed (see maintenance._require_gc_enabled)
        existing = [
            c for c in src.properties.get("clones", "").split(",") if c
        ]
        if dst_identifier not in existing:
            src.set_property("clones", ",".join(existing + [dst_identifier]))
        return self.load_table(dst_identifier)

    def load_table(self, identifier: str) -> LakeTable:
        """loadTable parity (LocalIcebergCatalogTest.java:76-84)."""
        self._require_started()
        if not self.table_exists(identifier):
            raise KeyError(f"no such table: {identifier}")
        with open(self._pointer_file(identifier)) as f:
            table_dir = json.load(f)["table_dir"]
        return LakeTable(
            self.spark, table_dir, identifier, self._reporter, io=self.commit_io
        )

    def drop_table(self, identifier: str, purge: bool = False) -> None:
        """Unregister (and with ``purge`` delete) a table. Purging a
        table that registered clones would delete data files the
        clones' inherited manifests still reference — refused, like
        source-side maintenance (drop the clones first, or drop
        without purge to keep the shared files)."""
        self._require_started()
        if not self.table_exists(identifier):
            raise KeyError(f"no such table: {identifier}")
        if purge:
            clones = [
                c
                for c in self.load_table(identifier)
                .properties.get("clones", "")
                .split(",")
                if c
            ]
            live = [c for c in clones if self.table_exists(c)]
            if live:
                raise ValueError(
                    f"cannot purge {identifier}: clones {live} still reference "
                    "its data files; drop them first or drop without purge"
                )
        with open(self._pointer_file(identifier)) as f:
            table_dir = json.load(f)["table_dir"]
        os.remove(self._pointer_file(identifier))
        if purge:
            import shutil

            shutil.rmtree(table_dir, ignore_errors=True)
