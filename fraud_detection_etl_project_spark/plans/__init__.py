"""Query inventory: every operator exposed as a (spark_fn, oracle_sql) pair.

``REGISTRY`` maps query name -> QuerySpec. ``__spark_entry__.queries()`` and
``oracle_sql()`` are thin views over it; ``bench.py`` runs the specs flagged
``bench=True``.
"""

from fraud_detection_etl_project_spark.plans.registry import BENCH_QUERIES, REGISTRY, QuerySpec

# importing the modules populates REGISTRY
from fraud_detection_etl_project_spark.plans import relational_queries  # noqa: F401,E402
from fraud_detection_etl_project_spark.plans import llm_queries  # noqa: F401,E402
from fraud_detection_etl_project_spark.plans import extended_queries  # noqa: F401,E402
from fraud_detection_etl_project_spark.plans import curation_queries  # noqa: F401,E402

__all__ = ["REGISTRY", "BENCH_QUERIES", "QuerySpec"]
