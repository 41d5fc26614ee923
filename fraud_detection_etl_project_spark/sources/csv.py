"""CSV source for PaySim-style transaction files.

The reference ships the same scan twice (SURVEY.md §2.1):

- inferred-schema columnar read — ``pd.read_csv`` at
  ``/root/reference/Lambda Function/lambda_function_aws.py:39`` (S3);
- explicit-schema row read with per-field casts where any malformed value
  aborts the whole file — ``fraud_detection_ETL.zip!lambda_function_aws.py:
  36-52`` with the catch-all at ``:130-132`` (S4; FAILFAST semantics).

Here both are modes of one declarative reader. Spark's CSV source gives the
rest for free: splittable multi-file scans, vectorized parsing, and (unlike
the reference's 512 MB ``/tmp`` ceiling) no single-node size limit — paths may
be local, ``s3a://``, ``hdfs://``, or globs over a landing directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fraud_detection_etl_project_spark.schemas import TXN_SCHEMA


def read_transactions(
    spark: SparkSession,
    path: str,
    mode: str = "FAILFAST",
    infer_schema: bool = False,
) -> DataFrame:
    """Scan one-or-many transaction CSVs.

    ``mode="FAILFAST"`` reproduces the zip variant's abort-on-bad-value
    semantics; ``mode="PERMISSIVE"`` keeps bad rows with nulls (plus a
    ``_corrupt_record`` column when selected), a recovery path the reference
    lacks. ``infer_schema=True`` mirrors the pandas variant instead.

    Case-insensitivity: with ``spark.sql.caseSensitive=false`` (engine
    default) a header of either ``oldbalanceOrg`` or ``oldbalanceorg``
    resolves against TXN_SCHEMA — the reference's intended behavior (its
    lowercase lookups KeyError on its own camelCase sample under pandas).
    """
    reader = spark.read.option("header", True).option("mode", mode)
    if infer_schema:
        return reader.option("inferSchema", True).csv(path)
    # Explicit schema: header names are validated case-insensitively against
    # the schema via enforceSchema=false semantics being too strict; instead
    # we read positionally (the reference's column order is fixed by its DDL).
    return reader.schema(TXN_SCHEMA).csv(path)
