"""Sinks: partitioned file writers + JDBC append with reference semantics.

The reference's only sink is a fixed-DDL Postgres table fed by one
``executemany`` batch in one transaction per file
(``/root/reference/Lambda Function/lambda_function_aws.py:70-99``). Spark's
JDBC writer is per-partition (one connection + transaction per task), so
"one transaction per file" is not the default — ``jdbc_append`` documents
the deviation and ``jdbc_atomic_append`` restores file-level atomicity with
the staging-table + swap pattern (SURVEY.md §3.4).

File sinks are the scale path: partitioned parquet is the engine's native
output format at 100 TB (predicate-pushdown-able, splittable, zstd), CSV is
the reference-parity interchange format.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Reference sink DDL column widths, lambda_function_aws.py:70-85.
# Spark parses createTableColumnTypes with ITS OWN DDL parser and maps the
# resulting Catalyst types through the JDBC dialect (Postgres gets DOUBLE
# PRECISION, Derby gets DOUBLE) — so the spelling here must be Spark SQL
# ("DOUBLE"), not the reference's Postgres DDL. The first live-JDBC test
# (tests/test_jdbc_derby.py) caught the Postgres spelling failing to parse;
# the VARCHAR widths are the reference's (lambda_function_aws.py:70-85).
TXN_COLUMN_TYPES = (
    "step INT, type VARCHAR(20), amount DOUBLE, nameOrig VARCHAR(50), "
    "oldbalanceOrg DOUBLE, newbalanceOrig DOUBLE, "
    "nameDest VARCHAR(50), oldbalanceDest DOUBLE, "
    "newbalanceDest DOUBLE, isFraud INT, isFlaggedFraud INT"
)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Partitioned parquet sink.

    ``partition_by`` becomes the directory layout — downstream scans with a
    predicate on those columns read only matching directories (partition
    pruning). ``maxRecordsPerFile`` caps file size so a skewed partition
    can't produce one unsplittable multi-GB file.
    """
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    """CSV sink (reference interchange format; header on, UTF-8)."""
    df.write.mode(mode).option("header", header).csv(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted catalog table: the co-located-join layout.

    Two tables bucketed on the same key with the same bucket count join
    WITHOUT a shuffle (and without even a sort when ``sort_cols`` match the
    join key) — the standing fix for the repeated big-big join at 100 TB:
    pay one shuffle at write time, amortize it over every subsequent join
    and aggregation on that key. Requires ``saveAsTable`` (bucket metadata
    lives in the catalog, not the files).
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str],
    batchsize: int = 1000,
    num_partitions: int | None = None,
    create_table_column_types: str | None = TXN_COLUMN_TYPES,
) -> None:
    """JDBC append mirroring the reference sink (S5+S6, SURVEY.md §2.1).

    - ``create_table_column_types`` pins VARCHAR widths as the reference DDL
      does (``lambda_function_aws.py:70-85``); Spark issues the
      CREATE TABLE IF NOT EXISTS equivalent on first append.
    - ``batchsize`` batches INSERTs as ``executemany`` did
      (``lambda_function_aws.py:97``).
    - ``num_partitions`` caps connection fan-out: at 1000 executors an
      uncapped append opens 1000 connections; cap to what the database pool
      tolerates (each partition commits independently — the per-partition
      transaction deviation documented in SURVEY.md §3.4).
    """
    w = df
    if num_partitions is not None:
        w = df.coalesce(num_partitions)
    writer = w.write.mode("append").option("batchsize", batchsize)
    if create_table_column_types:
        writer = writer.option("createTableColumnTypes", create_table_column_types)
    writer.jdbc(url, table, properties=properties)


def write_jsonl(
    df: DataFrame, path: str, mode: str = "overwrite", compression: str | None = "gzip"
) -> None:
    """JSON-lines sink (one object per line — the only JSON layout whose
    files split for parallel re-reads; mirrors sources/json.py). Gzip by
    default for interchange; pass ``compression=None`` for raw text."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink (Spark-native columnar alternative to parquet; same
    partition-pruning and predicate-pushdown behavior — useful when the
    downstream stack is Hive/ORC-based)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def merge_upsert(target: DataFrame, updates: DataFrame, key_cols: list[str]) -> DataFrame:
    """MERGE/upsert semantics on plain DataFrames: rows from ``updates``
    replace same-key rows in ``target``; unmatched target rows pass
    through. The composition is one left-anti join + union — at scale both
    sides shuffle once on the key (or the updates side broadcasts when
    small, the common CDC case). Write the result with
    ``write_parquet(..., mode="overwrite")`` for an idempotent batch merge;
    table formats with transactional MERGE (Delta/Iceberg) slot in here
    unchanged when available."""
    untouched = target.join(updates.select(*key_cols), on=key_cols, how="left_anti")
    return untouched.unionByName(updates)


def apply_cdc(
    snapshot: DataFrame,
    feed: DataFrame,
    key_col: str,
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Full CDC apply (inserts + updates + deletes) of a change feed onto a
    snapshot.

    ``feed`` rows carry ``op`` ∈ {'I','U','D'}, the business key, a
    monotone sequence column, and the payload columns (same names as the
    snapshot's non-key columns; null for deletes). Per key, the
    HIGHEST-sequence change wins (a delete after an update deletes); the
    survivor is joined full-outer onto the snapshot:

    - op 'D'            → row removed
    - op 'U' / 'I'      → feed payload replaces / adds the row
    - no feed row       → snapshot row passes through

    Scale: one window pass on the feed (shuffle on key; the feed is the
    small side in steady-state CDC) + one full join with the snapshot on
    the same key. Output columns: key, every payload column, and
    ``last_op`` ('N' for untouched rows) for audit."""
    from pyspark.sql import Window

    payload_cols = [c for c in snapshot.columns if c != key_col]
    w = Window.partitionBy(key_col).orderBy(F.col(seq_col).desc())
    latest = (
        feed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", seq_col)
    )
    s = snapshot.alias("s")
    l = latest.alias("l")  # noqa: E741
    joined = s.join(l, F.col(f"s.{key_col}") == F.col(f"l.{key_col}"), "full_outer")
    kept = joined.filter(F.col(f"l.{op_col}").isNull() | (F.col(f"l.{op_col}") != "D"))
    use_feed = F.col(f"l.{op_col}").isin("U", "I")
    return kept.select(
        F.coalesce(F.col(f"s.{key_col}"), F.col(f"l.{key_col}")).alias(key_col),
        *[
            F.when(use_feed, F.col(f"l.{c}")).otherwise(F.col(f"s.{c}")).alias(c)
            for c in payload_cols
        ],
        F.coalesce(F.col(f"l.{op_col}"), F.lit("N")).alias("last_op"),
    )


def jdbc_stream_sink(
    url: str,
    table: str,
    properties: dict[str, str],
    batchsize: int = 1000,
    num_partitions: int | None = None,
):
    """foreachBatch callable appending each micro-batch over JDBC — the
    reference's per-file Lambda→RDS append re-expressed for
    ``streaming/file_pipeline.run_fraud_stream``. Combined with the
    stream's checkpoint, batch replay after failure re-runs the same
    batch_id, so a sink-side idempotency key (batch_id column or staging
    swap) upgrades at-least-once to effectively-once — the reference's
    duplicate-delivery gap, closed."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        jdbc_append(
            batch_df,
            url,
            table,
            properties,
            batchsize=batchsize,
            num_partitions=num_partitions,
        )

    return sink


def jdbc_atomic_append(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str],
    run_ddl=None,
    batchsize: int = 1000,
) -> str:
    """File-level atomic append: write to a staging table, then one
    transactional ``INSERT INTO target SELECT * FROM staging; DROP``.

    Restores the reference's one-transaction-per-file semantics
    (``lambda_function_aws.py:99``) on top of Spark's per-partition writes:
    a failed job leaves only an orphan staging table, never a partial
    target. ``run_ddl(sql: str)`` executes the swap server-side (callers
    supply it via their JDBC/DBAPI driver; kept injectable because this
    container has no database). Returns the staging table name.
    """
    staging = f"{table}_stage_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").option("batchsize", batchsize).jdbc(
        url, staging, properties=properties
    )
    swap = (
        f"BEGIN; INSERT INTO {table} SELECT * FROM {staging}; "
        f"DROP TABLE {staging}; COMMIT;"
    )
    if run_ddl is not None:
        run_ddl(swap)
    return staging


def write_range_sorted(
    df: DataFrame, path: str, range_col: str, n_files: int, mode: str = "overwrite"
) -> None:
    """Range-partitioned, within-file-sorted parquet layout: the storage
    organization that makes range predicates cheap at 100 TB.

    ``repartitionByRange`` samples the column and assigns disjoint value
    ranges to partitions (one output file each); ``sortWithinPartitions``
    orders rows inside every file, so parquet writes tight, monotone
    min/max statistics per row group. A later scan with a range predicate
    then (a) prunes whole files via footer stats and (b) prunes row groups
    inside the surviving file — the poor man's clustered index, no
    lakehouse runtime needed. Trade: one extra range-shuffle + sort at
    write time, amortized over every subsequent read.
    """
    (
        df.repartitionByRange(n_files, F.col(range_col))
        .sortWithinPartitions(range_col)
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ceil(total_bytes / target) files and atomically swap it in. Returns
    the new file count.

    The 100 TB housekeeping operator: streaming sinks and incremental
    merges accrete small files, and at scale the cost is real — file
    listing, per-file open overhead, and row groups too small for
    effective column statistics. Compaction restores ~target-sized files
    (default 128 MB, the usual HDFS/S3 sweet spot). The swap is
    directory-rename atomic like the CDC merge sink; table formats do
    this as a transactional rewrite (OPTIMIZE), same logic."""
    import math
    import shutil

    df = spark.read.parquet(path)
    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    tmp, old = f"{path}.compact_tmp", f"{path}.compact_old"
    df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files
