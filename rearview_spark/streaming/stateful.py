"""Custom stateful streaming operator: the alert lifecycle as
``applyInPandasWithState`` (SURVEY.md §2.4 S4 — the streaming alternative
to the JobStore-merge loop; same pure transition function either way).

Keyed by series, the operator evaluates each micro-batch's window of
points against a threshold, runs the debounce/incident state machine
(monitors/lifecycle.py) against the per-key state, and emits one
evaluation row per (key, batch). Time is *event time* (the batch's max
``ts``), not wall clock, so replaying the same files yields the same
transitions — the determinism the correctness gate and reprocessing at
100 TB both need.

State is (status, last_alerted_at-as-epoch-micros): a few bytes per
series, so state size scales with series cardinality, not data volume —
millions of keys per executor are fine in the HDFS-backed state store.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from rearview_spark.monitors.lifecycle import FAILED, SUCCESS, transition

EVAL_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType()),
        T.StructField("eval_ts", T.TimestampType()),
        T.StructField("mean_value", T.DoubleType()),
        T.StructField("run_status", T.StringType()),
        T.StructField("new_status", T.StringType()),
        T.StructField("should_alert", T.BooleanType()),
        T.StructField("incident", T.StringType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("status", T.StringType()),
        T.StructField("last_alerted_us", T.LongType()),
    ]
)


def stateful_alert_lifecycle(
    metrics: DataFrame,
    threshold: float,
    error_timeout_minutes: int = 60,
) -> DataFrame:
    """``metrics`` is a *streaming* tall frame (metric, ts, value). Each
    micro-batch contributes one evaluation per key: mean(value) vs
    ``threshold`` -> lifecycle transition -> emitted row + updated state."""

    def evaluate(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs))
        if rows.empty:
            return
        (metric,) = key
        prev_status, last_alerted = None, None
        if state.exists:
            prev_status, last_us = state.get
            if last_us is not None:
                last_alerted = pd.Timestamp(last_us, unit="us").to_pydatetime()
        now = rows["ts"].max().to_pydatetime()
        mean_v = float(rows["value"].mean())
        run_status = FAILED if mean_v > threshold else SUCCESS
        t = transition(prev_status, last_alerted, run_status, now, error_timeout_minutes)
        new_last_us = (
            int(t.new_last_alerted_at.timestamp() * 1_000_000)
            if t.new_last_alerted_at is not None
            else None
        )
        state.update((t.new_status, new_last_us))
        yield pd.DataFrame(
            [
                {
                    "metric": metric,
                    "eval_ts": now,
                    "mean_value": mean_v,
                    "run_status": run_status,
                    "new_status": t.new_status,
                    "should_alert": t.should_alert,
                    "incident": t.incident,
                }
            ]
        )

    return (
        metrics.groupBy("metric")
        .applyInPandasWithState(
            evaluate,
            outputStructType=EVAL_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
