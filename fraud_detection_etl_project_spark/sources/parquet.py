"""Parquet source for the fixture tables.

Scale notes: parquet scans are Spark's fastest path — vectorized reader,
predicate pushdown to row-group statistics, column pruning. Keeping this a
plain ``spark.read.parquet`` (no collect, no pandas round-trip) is what makes
the same code work at sf0.001 and at 100 TB; everything downstream is lazy.

One fixture quirk handled here: ``events.parquet`` stores ``ts`` as
TIMESTAMP(NANOS), which Spark's reader rejects outright. With
``spark.sql.legacy.parquet.nanosAsLong=true`` (set by session.get_spark) the
column arrives as nanoseconds-since-epoch LongType, and we convert it to a
microsecond TimestampType with integer division — truncation, matching what
microsecond-native engines (DuckDB, Postgres) do when reading the same file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from fraud_detection_etl_project_spark.schemas import FIXTURE_TABLES

# Semantics-bearing confs every query assumes. They are normally set by
# session.get_spark(), but callers (test harnesses, notebooks) may hand us a
# session they built themselves — so pin them again at read time. All three
# are runtime-settable (verified: spark.conf.set then re-read succeeds).
_REQUIRED_CONFS = {
    # events.parquet stores TIMESTAMP(NANOS); without this the scan throws
    # PARQUET_TYPE_ILLEGAL. With it, ts arrives as LongType nanoseconds.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Oracle comparisons assume UTC wall-clock rendering.
    "spark.sql.session.timeZone": "UTC",
    # Reference resolves column names case-insensitively (SURVEY §2.2).
    "spark.sql.caseSensitive": "false",
}


def pin_session_confs(spark: SparkSession) -> None:
    """Force the confs our query semantics depend on, on any session."""
    for key, value in _REQUIRED_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            pass  # a conf made static in some future Spark: keep going


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table; normalizes ns-precision timestamps to µs."""
    pin_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # ns -> µs truncation; timestamp_micros keeps this JVM-side (no UDF).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    """Load several fixture tables as a dict (default: all of them)."""
    return {n: load_table(spark, sf_dir, n) for n in (names or FIXTURE_TABLES)}
