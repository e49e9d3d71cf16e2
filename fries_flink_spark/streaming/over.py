"""Streaming over-aggregation + late-data routing (SURVEY §2.6 streaming
rows, §2.5 allowedLateness).

Reference:
- RowTimeRangeUnboundedPrecedingFunction.java (296 LoC) + 5 siblings: per-key
  running aggregates over event-time order, state-backed.
- WindowedStream.sideOutputLateData (WindowedStream.java:124) +
  allowedLateness(:108): rows older than the watermark route to a side
  output instead of being dropped silently.

Spark mappings:
- ``streaming_running_agg``: applyInPandasWithState carries the running
  (sum, count) per key; each micro-batch's rows sort by event time, get the
  cumulative values on top of the carried state, and advance it. Exactly the
  reference's unbounded-preceding ROWS frame, with the micro-batch as the
  ordering unit across batches (the replayed stream must be chunk-ordered by
  time, as any watermarked pipeline requires).
- ``LateDataRouter``: foreachBatch wrapper that tracks max event time seen
  and splits each batch at ``max_seen - delay`` — on-time rows go to the main
  sink, late rows to the dead-letter sink. This materializes the "late
  side output" the survey documents as a pattern.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from datetime import timedelta

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_running_agg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    output_schema: str,
    tiebreak_col: str | None = None,
):
    """Per-key running sum/count across micro-batches (reference
    RowTime*UnboundedPrecedingFunction). Output adds ``running_sum`` and
    ``running_count`` to (keys, ts, value)."""
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])

    def wrapper(key, pdf_iter, state: GroupState):
        parts = [p for p in pdf_iter if len(p)]
        if state.exists:
            (raw,) = state.get
            st = json.loads(raw) if raw else {}
        else:
            st = {}
        base_sum = st.get("sum", 0.0)
        base_n = st.get("n", 0)
        if parts:
            batch = pd.concat(parts).sort_values(order)
            vals = batch[value_col].astype(float)
            batch["running_sum"] = vals.cumsum() + base_sum
            batch["running_count"] = range(base_n + 1, base_n + 1 + len(batch))
            st["sum"] = float(vals.sum()) + base_sum
            st["n"] = base_n + len(batch)
            state.update((json.dumps(st),))
            yield batch
        else:
            state.update((json.dumps(st),))

    return df.groupBy(*key_cols).applyInPandasWithState(
        wrapper,
        output_schema,
        "state string",
        "append",
        GroupStateTimeout.NoTimeout,
    )


class LateDataRouter:
    """allowedLateness + late side output, per micro-batch.

    ``start(stream_df)`` runs foreachBatch; rows with
    ``ts < max_event_time_seen - delay`` go to ``late_sink``, the rest to
    ``main_sink``. The max is tracked across batches (driver scalar — the
    same global watermark Spark itself maintains)."""

    def __init__(
        self,
        ts_col: str,
        delay: timedelta,
        main_sink: Callable[[DataFrame, int], None],
        late_sink: Callable[[DataFrame, int], None],
    ):
        self.ts_col = ts_col
        self.delay = delay
        self.main_sink = main_sink
        self.late_sink = late_sink
        self.max_seen = None

    def _run_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if self.max_seen is not None:
            threshold = self.max_seen - self.delay
            is_late = F.col(self.ts_col) < F.lit(threshold)
            self.late_sink(batch_df.filter(is_late), epoch_id)
            self.main_sink(batch_df.filter(~is_late), epoch_id)
        else:
            self.main_sink(batch_df, epoch_id)
        row = batch_df.agg(F.max(self.ts_col).alias("m")).collect()[0]
        if row["m"] is not None and (self.max_seen is None or row["m"] > self.max_seen):
            self.max_seen = row["m"]

    def start(self, stream_df: DataFrame, trigger: dict | None = None):
        writer = stream_df.writeStream.foreachBatch(self._run_batch)
        if trigger:
            writer = writer.trigger(**trigger)
        return writer.start()
