"""Structured Streaming ingest — the Spark-native answer to the
reference's insert-trigger append path (columnar_store_insert_trigger,
imcs.c:4617-4812, and TABLE_append with ascending-timestamp
enforcement, imcs.c:4299-4300).

The reference appends row-by-row under a writer lock. Here a stream
(file source, rate source, Kafka, ...) is appended micro-batch-wise to
a Parquet-backed series table via foreachBatch; each batch is checked
for timestamp monotonicity against the running per-series maximum —
the same out-of-order rejection, but batched and parallel. Late data
can alternatively be *watermarked* away instead of erroring, which the
reference cannot express (SURVEY §2.8: it has no watermarks).
"""

from __future__ import annotations



from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def append_stream(
    stream_df: DataFrame,
    target_path: str,
    ts_col: str,
    id_col: str | None = None,
    on_violation: str = "error",  # error | drop
    checkpoint: str | None = None,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Write a stream into a series table with ordered-append
    semantics. on_violation='drop' silently discards rows older than
    the stored per-series max (watermark-style); 'error' raises —
    matching the reference trigger's behavior."""
    state: dict = {}

    def handle_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        try:
            current = spark.read.parquet(target_path)
            if id_col:
                maxes = current.groupBy(id_col).agg(F.max(ts_col).alias("_maxts"))
            else:
                maxes = current.agg(F.max(ts_col).alias("_maxts"))
        except Exception:  # first batch, empty table
            maxes = None
        out = batch
        if maxes is not None:
            if id_col:
                out = batch.join(F.broadcast(maxes), id_col, "left")
            else:
                out = batch.crossJoin(F.broadcast(maxes))
            late = out.filter(F.col(ts_col) < F.col("_maxts"))
            if on_violation == "error":
                n = late.limit(1).count()
                if n:
                    raise ValueError(
                        f"out-of-order append into {target_path} (batch {batch_id})"
                    )
            else:
                out = out.filter(
                    F.col("_maxts").isNull() | (F.col(ts_col) >= F.col("_maxts"))
                )
            out = out.drop("_maxts")
        out.write.mode("append").parquet(target_path)

    writer = stream_df.writeStream.foreachBatch(handle_batch)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_agg_stream(
    stream_df: DataFrame,
    ts_col: str,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
    agg_exprs: list | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Event-time tumbling-window aggregate with late-data watermark —
    the streaming counterpart of cs_grid_* positional buckets, keyed by
    event time instead of position."""
    aggs = agg_exprs or [F.count(F.lit(1)).alias("cnt")]
    groups = [F.window(ts_col, window_duration)] + [F.col(c) for c in (group_cols or [])]
    return stream_df.withWatermark(ts_col, watermark).groupBy(*groups).agg(*aggs)


def sessionize_stream(
    stream_df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_seconds: int = 1800,
    watermark: str = "10 minutes",
):
    """Custom stateful streaming operator (applyInPandasWithState): the
    streaming counterpart of batch ``series.sessionize`` — per-user
    gap-based sessions maintained as keyed state across micro-batches.

    Emits one row per CLOSED session: (user, session_start, session_end,
    n_events). A session closes when a later event for the same user
    arrives more than ``gap_seconds`` after the previous one, or when
    the event-time timeout fires (watermark has passed the open
    session's last event + gap). State per key is three scalars — at
    1000-executor scale this shuffles once per batch on user_id and
    stores O(active users) state, the standard keyed-state layout.

    The reference cannot express this at all (no streaming state; its
    insert trigger is row-at-a-time, imcs.c:4617-4812)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{user_col} long, session_start timestamp, "
        "session_end timestamp, n_events long"
    )
    state_schema = "session_start long, last_ts long, n long"
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs, state: GroupState):
        uid = key[0]
        closed: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                s0, s1, n = state.get
                closed.append((uid, s0, s1, n))
            state.remove()
        else:
            # numpy fast path: this function runs once per key per
            # micro-batch, so per-call overhead is the dominant cost at
            # high key cardinality — avoid pd.to_datetime's inference
            # when the column is already datetime64 (the usual case for
            # an event-time stream).
            ts_list: list[int] = []
            for pdf in pdfs:
                arr = pdf[ts_col].to_numpy()
                if arr.dtype.kind == "M":
                    col = arr.astype("datetime64[us]").astype("int64")
                else:
                    col = pd.to_datetime(pdf[ts_col]).astype("int64") // 1000
                ts_list.extend(col.tolist())
            ts_list.sort()
            if ts_list:
                if state.exists:
                    s0, s1, n = state.get
                else:
                    s0, s1, n = ts_list[0], ts_list[0], 0
                for t in ts_list:
                    if n > 0 and t - s1 > gap_us:
                        closed.append((uid, s0, s1, n))
                        s0, n = t, 0
                    s1 = t
                    n += 1
                state.update((s0, s1, n))
                state.setTimeoutTimestamp((s1 + gap_us) // 1000)
        if closed:
            yield pd.DataFrame(
                {
                    user_col: [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                    "n_events": [c[3] for c in closed],
                }
            )

    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def dedup_stream(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "10 minutes",
    digest_col: str = "_digest",
) -> DataFrame:
    """Streaming exact dedup — the streaming face of
    pipeline.dedup.exact_dedup: keep the first arrival of each
    normalized-content digest, drop later duplicates across
    micro-batches.

    With ``ts_col`` the digest state is bounded by the watermark
    (dropDuplicatesWithinWatermark): a duplicate arriving within the
    watermark horizon of the first copy is dropped, and state for
    digests older than the watermark is evicted — the only formulation
    whose state does NOT grow with the full history, which is the one
    that survives an unbounded 100 TB/day stream. Without ``ts_col``
    it falls back to global dropDuplicates (state = one row per
    distinct digest — bounded corpora only)."""
    digest = F.md5(
        F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    )
    s = stream_df.withColumn(digest_col, digest)
    if ts_col:
        s = s.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            [digest_col]
        )
    else:
        s = s.dropDuplicates([digest_col])
    return s.drop(digest_col)
