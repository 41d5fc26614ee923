"""Streaming CDC: a change-feed file stream merged into a parquet target
per micro-batch.

The lakehouse-shaped composition: ``foreachBatch`` turns each micro-batch
of change rows (op I/U/D + key + seq) into one ``sinks.apply_cdc`` merge
against the current target, written out with an atomic directory swap.
Checkpointing makes file re-delivery idempotent — a replayed drain with no
new files leaves the target byte-stable. With a transactional table format
(Delta/Iceberg, not in this container) the swap becomes a real MERGE
commit; the batch logic is unchanged.

Scale: per batch, the feed is small (a few files) and the merge costs one
key shuffle of the target — the standard incremental-merge trade. Targets
too large to rewrite per batch partition by key range and rewrite only
touched partitions (dynamic partition overwrite).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from fraud_detection_etl_project_spark.sinks import apply_cdc


def run_cdc_stream(
    spark: SparkSession,
    landing_dir: str,
    checkpoint_dir: str,
    target_dir: str,
    feed_schema: StructType | str,
    key_col: str = "k",
    seq_col: str = "seq",
) -> None:
    """Drain the change-feed landing dir (availableNow) into the target."""
    feed = (
        spark.readStream.schema(feed_schema)
        .option("header", True)
        .option("maxFilesPerTrigger", 1)
        .csv(landing_dir)
    )

    def apply_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        target = spark.read.parquet(target_dir)
        merged = apply_cdc(target, batch_df, key_col=key_col, seq_col=seq_col).drop("last_op")
        tmp = f"{target_dir}.tmp{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        old = f"{target_dir}.old{batch_id}"
        os.rename(target_dir, old)
        os.rename(tmp, target_dir)
        shutil.rmtree(old)

    q = (
        feed.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
