"""Fries-equivalent runtime reconfiguration at epoch (micro-batch) boundaries.

The reference's single novel capability: the Fries controller propagates an
epoch-marker control message through the minimal covering subgraph of a running
dataflow so operator reconfiguration applies on a consistent cut WITHOUT
pausing the job (reference: flink-runtime/src/main/scala/org/apache/flink/
runtime/controller/Controller.scala:54-162 — timer-driven control;
FriesAlg.java:12-70 — MCS computation; ControlMessage.scala — serialized
callback; StreamTask.java:385-410 — re-broadcast as a CheckpointBarrier with
epoch 999999999).

Spark analog (SURVEY §3.3): every micro-batch boundary IS a global, consistent
epoch cut — the planner re-derives the incremental plan per batch. So Fries'
hard problem (cutting a running pipeline consistently) is structural in
Spark's execution model: no MCS computation, no barrier injection. This module
supplies the control-plane surface on top of it:

- ``ReconfigurableStream.reconfigure(**params)`` stages a config change from
  any thread; it takes effect atomically at the next epoch, never mid-batch.
- A reconfiguration log mirrors the reference controller's roundtrip
  measurement (Controller.scala:150): each entry records stage time, the epoch
  that first ran the new config, and apply latency in epochs/seconds.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame


@dataclass
class ReconfigEvent:
    version: int
    params: dict[str, Any]
    staged_at: float
    applied_epoch: int | None = None
    applied_at: float | None = None

    @property
    def roundtrip_s(self) -> float | None:
        if self.applied_at is None:
            return None
        return self.applied_at - self.staged_at


@dataclass
class ReconfigurableStream:
    """Wraps a streaming pipeline whose transformation depends on a mutable
    config. ``pipeline(batch_df, params) -> DataFrame`` is re-evaluated each
    epoch with the config consistent for that entire epoch.
    """

    source: DataFrame
    pipeline: Callable[[DataFrame, dict[str, Any]], DataFrame]
    sink: Callable[[DataFrame, int], None]
    params: dict[str, Any]
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)
    _pending: dict[str, Any] | None = field(default=None, repr=False)
    _version: int = 0
    log: list[ReconfigEvent] = field(default_factory=list)

    def reconfigure(self, **new_params) -> int:
        """Stage a config change; applies at the next epoch boundary.
        Returns the staged version number."""
        with self._lock:
            base = self._pending if self._pending is not None else self.params
            self._version += 1
            self._pending = {**base, **new_params}
            self.log.append(
                ReconfigEvent(self._version, dict(self._pending), time.time())
            )
            return self._version

    def _swap_if_pending(self, epoch_id: int) -> dict[str, Any]:
        with self._lock:
            if self._pending is not None:
                self.params = self._pending
                self._pending = None
                now = time.time()
                for ev in self.log:
                    if ev.applied_epoch is None:
                        ev.applied_epoch = epoch_id
                        ev.applied_at = now
            return dict(self.params)

    def start(self, checkpoint_dir: str | None = None, trigger: dict | None = None):
        """Start the query; the foreachBatch body performs the epoch-boundary
        config swap (the Fries barrier semantics, for free)."""

        def run_batch(batch_df: DataFrame, epoch_id: int) -> None:
            params = self._swap_if_pending(epoch_id)
            self.sink(self.pipeline(batch_df, params), epoch_id)

        writer = self.source.writeStream.foreachBatch(run_batch)
        if checkpoint_dir:
            writer = writer.option("checkpointLocation", checkpoint_dir)
        if trigger:
            writer = writer.trigger(**trigger)
        return writer.start()

    def average_roundtrip_s(self) -> float | None:
        """Average stage→apply latency (the reference controller's printed
        metric, Controller.scala:150)."""
        done = [e.roundtrip_s for e in self.log if e.roundtrip_s is not None]
        return sum(done) / len(done) if done else None
