"""Observed staged counts + streaming metrics listener."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from fraud_detection_etl_project_spark.observability import MetricsListener, observed
from fraud_detection_etl_project_spark.sources.parquet import load_table
from fraud_detection_etl_project_spark.streaming.windows import hourly_event_rollup

SF = "/root/testdata/sf0.001"


def test_observed_counts_ride_one_action(spark):
    orders = load_table(spark, SF, "orders")
    staged, obs_in = observed(orders, "rows_in")
    filtered, obs_f = observed(staged.filter(F.col("o_orderstatus") == "O"), "rows_open")
    n = filtered.count()  # single action drives both observations
    assert obs_in.get["n"] == orders.count()
    assert obs_f.get["n"] == n


def test_streaming_metrics_listener(spark):
    listener = MetricsListener()
    spark.streams.addListener(listener)
    try:
        hourly_event_rollup(spark, SF)
        # listener events are delivered asynchronously
        deadline = time.time() + 15
        while time.time() < deadline and listener.total_input_rows == 0:
            time.sleep(0.2)
        events_n = load_table(spark, SF, "events").count()
        assert listener.total_input_rows == events_n
        assert all(p.duration_ms >= 0 for p in listener.progress)
    finally:
        spark.streams.removeListener(listener)
