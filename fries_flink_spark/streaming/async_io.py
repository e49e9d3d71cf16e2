"""Async I/O + broadcast-state + queryable-state (SURVEY §2.10 tail).

Reference surface:
- AsyncDataStream.orderedWait/unorderedWait (AsyncDataStream.java:101,140):
  per-record async lookups against an external service with bounded
  in-flight requests.
- Broadcast state pattern (DataStream.broadcast:435,
  BroadcastConnectedStream.java): a low-volume control/dim stream visible to
  every parallel task of the main stream.
- Queryable state (KeyedStream.asQueryableState:1031): read a running job's
  keyed state from outside.

Spark-first mappings:
- Async I/O → ``mapInPandas`` whose generator drives an asyncio event loop
  per Arrow batch: the batch amortizes connection setup, ``max_in_flight``
  bounds concurrency per task — same knobs as the reference's capacity
  parameter. Results stay in input order (orderedWait semantics).
- Broadcast state → a plain Spark broadcast variable re-created per
  micro-batch in ``foreachBatch`` (every batch is an epoch, so the swap is
  consistent — same mechanism as streaming/reconfigure).
- Queryable state → write the stateful operator's output to the ``memory``
  sink; the named in-memory table is SQL-queryable while the stream runs.
"""

from __future__ import annotations

import asyncio
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame


def async_lookup(
    df: DataFrame,
    fn: Callable[[dict], "asyncio.Future | Any"],
    output_schema: str,
    max_in_flight: int = 64,
) -> DataFrame:
    """AsyncDataStream.orderedWait analog.

    ``fn(row_dict) -> awaitable returning a dict`` of extra columns; results
    merge onto the input row. Concurrency is bounded per task by
    ``max_in_flight`` (the reference's capacity); output preserves input
    order within each batch.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        async def run_batch(rows: list[dict]) -> list[dict]:
            sem = asyncio.Semaphore(max_in_flight)

            async def one(r: dict) -> dict:
                async with sem:
                    extra = await fn(r)
                return {**r, **extra}

            return list(await asyncio.gather(*[one(r) for r in rows]))

        for pdf in batches:
            out = asyncio.run(run_batch(pdf.to_dict("records")))
            yield pd.DataFrame(out)

    return df.mapInPandas(gen, schema=output_schema)


class BroadcastState:
    """Broadcast state pattern: hold a small keyed dict visible to every task,
    swapped atomically at micro-batch (epoch) boundaries.

    Use inside ``foreachBatch``: call ``refresh(batch_df_or_rows)`` with the
    latest control/dim snapshot, read ``value`` (a Spark broadcast) in the
    main-stream transformation.
    """

    def __init__(self, spark):
        self._sc = spark.sparkContext
        self._bc = self._sc.broadcast({})

    @property
    def value(self) -> dict:
        return self._bc.value

    def broadcast(self):
        return self._bc

    def refresh(self, mapping: dict) -> None:
        old = self._bc
        self._bc = self._sc.broadcast(dict(mapping))
        old.unpersist()


def as_queryable_state(stream_df: DataFrame, name: str, output_mode: str = "update"):
    """KeyedStream.asQueryableState analog: expose a streaming aggregate as a
    continuously-updated in-memory table queryable with ``spark.sql`` while
    the returned query runs."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
