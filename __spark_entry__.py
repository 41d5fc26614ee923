"""Driver contract for the spark-graft builder (PySpark target).

Thin views over ``fraud_detection_etl_project_spark.plans.REGISTRY`` — every
operator from SURVEY.md §2 is registered there as a (spark_fn, oracle_sql)
pair; see plans/relational_queries.py and plans/llm_queries.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fraud_detection_etl_project_spark.plans import REGISTRY

SF_SMALL = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Orders whose lineitem-derived total disagrees with the order header —
    the reference's balance-consistency filter idea
    (/root/reference/Lambda Function/lambda_function_aws.py:43-46) lifted
    to the fixture star schema (scan -> join -> agg -> filter).
    """
    return REGISTRY["flagship_inconsistent_orders"].fn(spark, SF_SMALL)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (omitted for approximate /
    non-SQL-expressible operators -> driver records rows-only checks)."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
