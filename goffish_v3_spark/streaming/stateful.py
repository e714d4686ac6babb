"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in streaming surface (streaming/events.py) covers watermarked
window aggregation and ``session_window`` sessionization; this module is the
engine's *custom* stateful operator — semantics Spark's built-ins cannot
express declaratively: **streaming first-touch dedup** with an unbounded
per-user seen-set. The first event of every ``(user_id, event_type)`` pair
is emitted exactly once, however late subsequent duplicates arrive; the
seen-set lives in the state store across micro-batches.

This is the streaming analogue of a training-data pipeline's "first
occurrence wins" dedup rule, and the reference pattern for any keyed
custom-state operator at 100 TB: state is partitioned by the group key
(user), each executor holds only its users' sets, and the per-batch work is
an Arrow-batched pandas kernel — no per-row Python in the hot path beyond
the grouped batch itself.

Exactness: emitted rows are the ``(ts, event_id)``-minimum per pair as long
as each user's events arrive in ``(ts, event_id)`` order across
micro-batches (batches are sorted internally, so single-batch replays — the
test and driver path — are exact regardless of file order). That makes the
operator oracle-checkable against a plain ``row_number() = 1`` SQL twin.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, event_type string, first_ts timestamp, "
    "first_event_id long, first_value double"
)
STATE_SCHEMA = "seen array<string>"


def _first_touch_fn(
    key, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    # one micro-batch arrives as an ITERATOR of Arrow chunks (split at
    # maxRecordsPerBatch) in no guaranteed order — dedup per chunk would let
    # a later chunk's earlier-(ts, event_id) event lose to an already-seen
    # type; concatenate first (bounded by the user's batch volume), then
    # take the global per-type minimum
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"], kind="stable"
        )
        fresh = pdf[~pdf["event_type"].isin(seen)].drop_duplicates(
            "event_type", keep="first"
        )
        if len(fresh):
            seen.update(fresh["event_type"])
            yield pd.DataFrame(
                {
                    "user_id": fresh["user_id"],
                    "event_type": fresh["event_type"],
                    "first_ts": fresh["ts"],
                    "first_event_id": fresh["event_id"],
                    "first_value": fresh["value"],
                }
            )
    state.update((sorted(seen),))


def first_touch_stream(
    spark: SparkSession,
    parquet_path: str,
    query_name: str = "first_touch",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Run streaming first-touch dedup over a file-source replay of the
    events table and return the drained memory-sink result:
    ``(user_id, event_type, first_ts, first_event_id, first_value)``.

    ``max_files_per_trigger`` forces multi-micro-batch replays (one file per
    batch) — used by tests to prove the seen-set state suppresses duplicates
    arriving in LATER batches, which no stateless operator can."""
    import os

    from goffish_v3_spark.streaming.events import _read_stream

    if max_files_per_trigger is None:
        stream = _read_stream(spark, parquet_path)
    else:
        # mirror _read_stream's single-file handling (file source wants a
        # directory) while adding the per-trigger file cap
        schema = spark.read.parquet(parquet_path).schema
        reader = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", max_files_per_trigger
        )
        if os.path.isdir(parquet_path):
            stream = reader.parquet(parquet_path)
        else:
            d, fname = os.path.split(parquet_path)
            stream = reader.option("pathGlobFilter", fname).parquet(d)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    out = stream.groupBy("user_id").applyInPandasWithState(
        _first_touch_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name).withColumn(
        "first_ts", F.col("first_ts").cast("timestamp_ntz")
    )


def first_touch_batch(events: DataFrame) -> DataFrame:
    """Batch twin: ``row_number() = 1`` over ``(ts, event_id)`` per
    ``(user_id, event_type)`` — the oracle semantics."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("first_ts"),
            F.col("event_id").alias("first_event_id"),
            F.col("value").alias("first_value"),
        )
    )
