"""Event-time-ordered streaming sort (SURVEY §2.7 — RowTimeSortOperator).

Reference: flink-table .../runtime/operators/sort/RowTimeSortOperator.java
(buffer rows keyed by rowtime; on watermark advance, emit all rows with
rowtime <= watermark in rowtime order) and ProcTimeSortOperator.java (the
processing-time sibling: sort what arrived, emit on the next timer).

Spark has no ordered-emission streaming operator — micro-batch output is an
unordered DataFrame. The faithful rendition buffers rows in GroupState and
releases the watermark-covered prefix in rowtime order, stamping each row
with a dense ``emit_idx`` so the emission ORDER is a verifiable column (the
only representation of order an unordered sink can carry).

Mechanics that make it correct under Spark's micro-batch model:
- The watermark visible to batch N is computed from data through batch N-1
  (Spark's one-batch watermark lag), so a row emits on the first batch whose
  watermark passes its rowtime — same release rule as the reference, one
  batch later than Flink's per-record watermark propagation.
- An event-time timeout is re-armed just past the current watermark each
  call, so buffered rows flush when the watermark advances even if the key
  receives no further data (reference: watermark processing fires the
  rowtime timer without new elements).
- Ties on rowtime emit in arrival order (a per-key arrival ``seq`` kept in
  state), matching the reference's FIFO tie-break for equal timestamps.
- Rows older than the current watermark never reach the operator — Spark
  filters late input to stateful ops, exactly the reference's late-row drop
  (RowTimeSortOperator drops rows at or below the last triggering
  watermark). Disorder beyond the watermark delay is therefore LOST on both
  engines; size the delay to the source's disorder bound.

At 100 TB: state per key is bounded by rows inside one watermark horizon —
identical to the reference's pending-rows map. Use key_cols to shard; the
global (single-key) variant has the same parallelism=1 contract as the
reference's non-keyed sort.
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def event_time_sorted(
    df: DataFrame,
    ts_col: str,
    payload_cols: list[str],
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Emit rows in event-time order once the watermark passes their rowtime.

    ``df`` must already carry a watermark on ``ts_col`` (withWatermark).
    Output: key cols + ``ts_ms`` (rowtime, epoch millis) + payload cols +
    ``emit_idx`` (dense per-key emission index 0,1,2,… — the order proof).
    Buffered payload values must be JSON-serializable (project timestamps to
    epoch numbers upstream, as with the other state-backed operators here).
    """
    keys = key_cols or []
    fields = ", ".join(
        [f"{k} string" for k in keys]
        + ["ts_ms long"]
        + [f"{c} double" for c in payload_cols]
        + ["emit_idx long"]
    )
    out_cols = keys + ["ts_ms"] + payload_cols + ["emit_idx"]

    def wrapper(key, pdf_iter, state: GroupState):
        if state.exists:
            raw, emitted = state.get
            buf = json.loads(raw) if raw else []
        else:
            buf, emitted = [], 0
        seq = max((r["__seq"] for r in buf), default=-1) + 1
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            # columnar extraction (no iterrows): tolist() once per column,
            # then a plain zip — ~10x on wide batches
            ts_ms = (
                pdf[ts_col].astype("datetime64[ns]").astype("int64") // 1_000_000
            ).tolist()
            payload = [pdf[c].astype(float).tolist() for c in payload_cols]
            for j, t in enumerate(ts_ms):
                buf.append(
                    {
                        "ts_ms": int(t),
                        "__seq": seq,
                        **{c: col[j] for c, col in zip(payload_cols, payload)},
                    }
                )
                seq += 1
        wm = state.getCurrentWatermarkMs()
        ready = sorted(
            (r for r in buf if r["ts_ms"] <= wm), key=lambda r: (r["ts_ms"], r["__seq"])
        )
        buf = [r for r in buf if r["ts_ms"] > wm]
        state.update((json.dumps(buf), emitted + len(ready)))
        # flush on the next watermark advance even without new data
        state.setTimeoutTimestamp(wm + 1)
        if ready:
            kv = dict(zip(keys, key if isinstance(key, tuple) else (key,)))
            yield pd.DataFrame(
                [
                    {
                        **kv,
                        "ts_ms": r["ts_ms"],
                        **{c: r[c] for c in payload_cols},
                        "emit_idx": emitted + i,
                    }
                    for i, r in enumerate(ready)
                ],
                columns=out_cols,
            )

    keyed = df if keys else df.withColumn("__k", F.lit("all"))
    return (
        keyed.groupBy(*(keys or ["__k"]))
        .applyInPandasWithState(
            wrapper,
            fields,
            "buf string, emitted long",
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
        .select(*out_cols)
    )
