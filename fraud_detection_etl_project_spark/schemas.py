"""Explicit schemas for the engine's tables.

The reference defines the transactions schema three times, consistently
(SURVEY.md §1.1): the CSV header (``/root/reference/Sample File/
test_aws.csv:1``), per-field casts (``/root/reference/Lambda Function/
fraud_detection_ETL.zip!lambda_function_aws.py:41-51``), and the sink DDL
(``/root/reference/Lambda Function/lambda_function_aws.py:70-85``). We define
it once as a StructType and derive the sink DDL from it (sources/jdbc.py).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# PaySim-style mobile-money transactions (the reference's only table).
TXN_SCHEMA = StructType(
    [
        StructField("step", IntegerType()),
        StructField("type", StringType()),
        StructField("amount", DoubleType()),
        StructField("nameOrig", StringType()),
        StructField("oldbalanceOrg", DoubleType()),  # "Org", not "Orig" — sic
        StructField("newbalanceOrig", DoubleType()),
        StructField("nameDest", StringType()),
        StructField("oldbalanceDest", DoubleType()),
        StructField("newbalanceDest", DoubleType()),
        StructField("isFraud", IntegerType()),
        StructField("isFlaggedFraud", IntegerType()),
    ]
)

TXN_COLUMNS = [f.name for f in TXN_SCHEMA.fields]

# JDBC sink column types, mirroring the reference DDL
# (lambda_function_aws.py:70-85). The SERIAL surrogate key is left to the
# database, exactly as the reference does (the engine never computes it).
TXN_SINK_COLUMN_TYPES = (
    "step INT, type VARCHAR(20), amount FLOAT, nameOrig VARCHAR(50), "
    "oldbalanceOrg FLOAT, newbalanceOrig FLOAT, nameDest VARCHAR(50), "
    "oldbalanceDest FLOAT, newbalanceDest FLOAT, isFraud INT, isFlaggedFraud INT"
)

# Driver fixture tables (/root/testdata/<sf>/<name>.parquet, FIXTURES.md §B).
# Parquet is self-describing; these exist for streaming reads (readStream
# requires a schema) and for schema assertions in tests.
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        # stored as µs TIMESTAMP (isAdjustedToUTC=false) in parquet; surfaces
        # as session-TZ TimestampType under the pinned reader confs
        # (sources.parquet._REQUIRED_CONFS).
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

FIXTURE_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
