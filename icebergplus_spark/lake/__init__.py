from icebergplus_spark.lake.catalog import LocalLakeCatalog, Status
from icebergplus_spark.lake.maintenance import (
    auto_maintain,
    cherry_pick,
    compact,
    expire_metadata_versions,
    expire_snapshots,
    remove_orphan_files,
    rewrite_deletion_vectors,
    rewrite_manifests,
    rollback,
)
from icebergplus_spark.lake.commitio import (
    CatalogServiceCommitIO,
    DirectoryLeaseCommitLock,
    FlockCommitLock,
    NullCommitLock,
    ObjectStoreCommitIO,
    RenameCommitIO,
)
from icebergplus_spark.lake.metrics import (
    COMMIT_COUNTER_FIELDS,
    COMMIT_TIMER_FIELDS,
    SCAN_COUNTER_FIELDS,
    SCAN_TIMER_FIELDS,
    CommitReport,
    MetricsReporter,
    MetricsSink,
    ScanReport,
)
from icebergplus_spark.lake.rest import (
    LakeRestServer,
    RestCommitIO,
    RestLakeCatalog,
)
from icebergplus_spark.lake.table import LakeTable
from icebergplus_spark.lake.txn import (
    LakeTransaction,
    TransactionAborted,
    gc_settled_transactions,
    recover_transactions,
)

__all__ = [
    "LocalLakeCatalog",
    "Status",
    "LakeTable",
    "LakeRestServer",
    "RestLakeCatalog",
    "RestCommitIO",
    "auto_maintain",
    "compact",
    "expire_snapshots",
    "rewrite_deletion_vectors",
    "expire_metadata_versions",
    "remove_orphan_files",
    "rewrite_manifests",
    "rollback",
    "cherry_pick",
    "MetricsSink",
    "MetricsReporter",
    "CommitReport",
    "ScanReport",
    "COMMIT_COUNTER_FIELDS",
    "COMMIT_TIMER_FIELDS",
    "SCAN_COUNTER_FIELDS",
    "SCAN_TIMER_FIELDS",
    "RenameCommitIO",
    "ObjectStoreCommitIO",
    "CatalogServiceCommitIO",
    "FlockCommitLock",
    "DirectoryLeaseCommitLock",
    "NullCommitLock",
    "LakeTransaction",
    "TransactionAborted",
    "gc_settled_transactions",
    "recover_transactions",
]
