"""Keyed stateful processing: the reference's KeyedProcessFunction surface
(state + timers) over ``applyInPandasWithState`` (SURVEY §2.10).

Reference: ProcessFunction.java:51-83 (processElement/onTimer), keyed state
primitives flink-core .../api/common/state/ (ValueState/ListState/MapState),
StateTtlConfig.java, TimerService.java.

Spark mapping: GroupState carries the user state dict; GroupStateTimeout
plays the timer role (processing-time timeouts); state TTL ≈ timeout-based
eviction. Event-time timers have no direct analog — the watermark-driven
variant fires on the batch after the state's event-time horizon passes, which
is the documented semantic difference.

Also here: streaming Top-N (reference AbstractTopNFunction.java:47) as an
``applyInPandasWithState`` operator maintaining the per-key top list across
micro-batches.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def keyed_process(
    df: DataFrame,
    key_cols: list[str],
    fn: Callable[[tuple, pd.DataFrame, dict[str, Any]], tuple[pd.DataFrame, dict]],
    output_schema: str,
    state_schema: str = "state string",
    timeout: str = "NoTimeout",
):
    """KeyedProcessFunction analog.

    ``fn(key, batch_pdf, state_dict) -> (out_pdf, new_state_dict)`` — the user
    sees plain Python state; serialization to the GroupState row is handled
    here (JSON in a single string column by default).
    """
    import json

    def wrapper(key, pdf_iter, state: GroupState):
        if state.exists:
            (raw,) = state.get
            st = json.loads(raw) if raw else {}
        else:
            st = {}
        outs = []
        for pdf in pdf_iter:
            out, st = fn(key, pdf, st)
            if out is not None and len(out):
                outs.append(out)
        state.update((json.dumps(st),))
        if outs:
            yield pd.concat(outs)

    timeout_conf = {
        "NoTimeout": GroupStateTimeout.NoTimeout,
        "ProcessingTimeTimeout": GroupStateTimeout.ProcessingTimeTimeout,
        "EventTimeTimeout": GroupStateTimeout.EventTimeTimeout,
    }[timeout]
    return df.groupBy(*key_cols).applyInPandasWithState(
        wrapper, output_schema, state_schema, "append", timeout_conf
    )


def streaming_topn(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    n: int,
    payload_cols: list[str],
    output_schema: str,
):
    """Global streaming Top-N per key across all micro-batches (reference
    AppendOnlyTopNFunction: keep the running top-n list in state, emit the
    current top-n whenever it changes)."""

    def fn(key, pdf: pd.DataFrame, st: dict):
        rows = st.get("top", [])
        # only the batch's own top-n can enter the running top-n; prune
        # before the Python-dict conversion (keep="first" preserves the
        # arrival-order tie-break of the append+stable-sort original)
        cand = pdf.nlargest(n, order_col, keep="first") if len(pdf) > n else pdf
        rows.extend(cand[payload_cols + [order_col]].to_dict("records"))
        rows.sort(key=lambda r: (-r[order_col],))
        rows = rows[:n]
        st["top"] = rows
        out = pd.DataFrame(
            [{**{k: v for k, v in zip(key_cols, key if isinstance(key, tuple) else (key,))}, **r} for r in rows]
        )
        return out, st

    return keyed_process(df, key_cols, fn, output_schema)


def count_window(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    n: int,
    agg: Callable[[pd.DataFrame], dict[str, Any]],
    output_schema: str,
):
    """Tumbling COUNT window per key (KeyedStream.countWindow:696 — absent
    from Spark): emit ``agg(window_rows)`` for every complete group of n
    events; the partial tail carries across micro-batches in state.

    Rows buffer in state as plain dicts (JSON), so buffered columns must be
    JSON-serializable — project timestamps to epoch numbers upstream. Events
    are ordered by ``order_col`` within each batch; cross-batch order is
    arrival order, as in the reference.
    """

    import json

    def wrapper(key, pdf_iter, state: GroupState):
        # Concatenate the WHOLE micro-batch before sorting: Arrow delivers a
        # group's rows as multiple chunks in arbitrary order, and emitting
        # windows chunk-by-chunk would fix row order too early.
        parts = [p for p in pdf_iter if len(p)]
        if state.exists:
            (raw,) = state.get
            buf = json.loads(raw) if raw else []
        else:
            buf = []
        if parts:
            batch = pd.concat(parts).sort_values(order_col)
            buf.extend(batch.to_dict("records"))
        outs = []
        keys = key if isinstance(key, tuple) else (key,)
        while len(buf) >= n:
            window_rows, buf = buf[:n], buf[n:]
            outs.append(
                {**dict(zip(key_cols, keys)), **agg(pd.DataFrame(window_rows))}
            )
        state.update((json.dumps(buf),))
        if outs:
            yield pd.DataFrame(outs)

    return df.groupBy(*key_cols).applyInPandasWithState(
        wrapper,
        output_schema,
        "state string",
        "append",
        GroupStateTimeout.NoTimeout,
    )
