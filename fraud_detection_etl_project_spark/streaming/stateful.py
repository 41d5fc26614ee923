"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference is stateless per file (SURVEY.md §2.9); this is the escape
hatch for operators Spark's built-in stateful surface (windowed aggs,
``dropDuplicates``) can't express: arbitrary per-key state evolved batch by
batch in Arrow-batched pandas — here a per-user running profile
(count / max / total of ``value``), the accumulating account-behavior
state a fraud scorer keeps.

Scale notes: state lives in the state store partitioned by the grouping
key (one shuffle per micro-batch on ``user_id``); each group's rows arrive
as pandas chunks, so per-key state is O(aggregate), not O(rows). On an
unbounded stream add a ``GroupStateTimeout`` policy so idle keys expire
instead of accreting forever.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from fraud_detection_etl_project_spark.streaming.windows import events_stream

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, max_value double, total_value double"
STATE_SCHEMA = "n bigint, mx double, tot double"


def _update_user_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, mx, tot = state.get if state.exists else (0, float("-inf"), 0.0)
    for pdf in pdfs:
        n += len(pdf)
        mx = max(mx, float(pdf["value"].max()))
        tot += float(pdf["value"].sum())
    state.update((n, mx, tot))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "max_value": [mx], "total_value": [tot]}
    )


def user_running_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the events stream through the stateful profile operator and
    return the final per-user state as a batch frame.

    Update-mode memory sink keeps every per-batch emission; ``n_events``
    strictly increases per key across emissions, so the final profile is
    the max-``n_events`` row per user (deterministic regardless of how the
    source splits into micro-batches).
    """
    profiles = (
        events_stream(spark, sf_dir)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    name = f"user_profiles_{uuid.uuid4().hex[:8]}"
    q = (
        profiles.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        spark.table(name)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
