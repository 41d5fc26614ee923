"""Sources and sinks: CSV / parquet readers, JDBC sink helpers."""

from fraud_detection_etl_project_spark.sources.csv import read_transactions
from fraud_detection_etl_project_spark.sources.parquet import load_table, load_tables

__all__ = ["read_transactions", "load_table", "load_tables"]
