"""Streaming state-store selection.

Spark keeps streaming state (windowed aggregates, dedup sets, join
buffers, applyInPandasWithState rows) in a per-partition state store. The
default HDFSBackedStateStoreProvider holds the working set in executor
HEAP — fine for bounded keyspaces, but at 100 TB-scale streams
(billions of live keys: device ids, session ids) the state dwarfs any
sane heap. RocksDBStateStoreProvider (bundled with Spark 4) spills state
to local SSD with an in-memory block cache, bounding heap usage
regardless of key cardinality, and supports changelog checkpointing so
per-batch snapshot upload cost is proportional to the delta, not the
store size.

Results are provider-independent — the provider is a storage engine, not
a semantics change — which tests/test_streaming.py asserts by running
the same stateful query under both providers. Switching is one conf; it
must be set BEFORE the streaming query starts (the provider is captured
per-query at start and persisted in the checkpoint).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

# Changelog checkpointing uploads per-batch deltas instead of full
# snapshots — the difference between O(delta) and O(store) checkpoint
# cost once state is large.
ROCKSDB_CONFS: dict[str, str] = {
    "spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER,
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
}


def use_rocksdb_state(spark: SparkSession) -> None:
    """Route subsequent streaming queries' state through RocksDB."""
    for k, v in ROCKSDB_CONFS.items():
        spark.conf.set(k, v)


def use_default_state(spark: SparkSession) -> None:
    """Restore the heap-backed default provider (small-state workloads)."""
    for k in ROCKSDB_CONFS:
        spark.conf.unset(k)
