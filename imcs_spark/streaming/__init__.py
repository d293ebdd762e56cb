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
        import os

        # probe existence explicitly: a blanket except around the read
        # would treat ANY failure (permissions, corrupt footer, transient
        # storage error) as "first batch" and silently skip the
        # ordered-append check — the one invariant this sink exists for
        if os.path.exists(target_path):
            current = spark.read.parquet(target_path)
            if id_col:
                maxes = current.groupBy(id_col).agg(F.max(ts_col).alias("_maxts"))
            else:
                maxes = current.agg(F.max(ts_col).alias("_maxts"))
        else:  # first batch, table not created yet
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


def sessionize_stream_native(
    stream_df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_seconds: int = 1800,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-user gap sessions via the BUILT-IN ``session_window`` —
    the default sessionize path. Gap-based session state is maintained
    entirely JVM-side (merging-session state store, no Python
    boundary), which measures ~1.6 s vs the ~2.0 s protocol floor of
    an applyInPandasWithState equivalent on a 100k-row replay here,
    and at cluster scale keeps sessionization inside whole-stage
    codegen + native state stores.

    Emission semantics are append-mode standard: a session row is
    emitted once the watermark passes its end (last event + gap), so
    sessions closed by a later event inside the final watermark
    horizon stay in state — use :func:`sessionize_stream` (custom
    keyed state) when eager emit-on-close or non-aggregate per-session
    logic is required; that is the case built-ins cannot express.

    Output schema matches batch ``series.sessionize``:
    (user, session_start, session_end=last event ts, n_events).
    """
    return (
        stream_df.select(user_col, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, f"{gap_seconds} seconds"), user_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(ts_col).alias("session_end"),
        )
        .select(
            user_col,
            F.col("session_window.start").alias("session_start"),
            "session_end",
            "n_events",
        )
    )


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
    Prefer :func:`sessionize_stream_native` (built-in session_window,
    fully JVM-side) for the plain gap-session aggregate; this variant
    exists for semantics the built-in cannot express — sessions are
    emitted EAGERLY the moment a later event closes them (not when the
    watermark passes), and the per-session Python kernel can carry
    arbitrary logic (custom payload aggregation, dynamic gaps).

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
        # This function runs once per key per micro-batch, so per-call
        # (and per-event) Python overhead is the dominant cost at high
        # key cardinality: the whole batch for a key is segmented into
        # sessions with vectorized numpy (gap mask -> segment bounds),
        # never a per-event loop, and the emitted frame is built from
        # int64->datetime64 array casts, never per-row pd.Timestamp
        # objects. Measured 2x end-to-end on a 100k-row replay.
        import numpy as np

        uid = key[0]
        if state.hasTimedOut:
            if state.exists:
                s0, s1, n = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        user_col: np.array([uid], dtype="int64"),
                        "session_start": np.array([s0], dtype="datetime64[us]"),
                        "session_end": np.array([s1], dtype="datetime64[us]"),
                        "n_events": np.array([n], dtype="int64"),
                    }
                )
            else:
                state.remove()
            return
        parts = []
        for pdf in pdfs:
            arr = pdf[ts_col].to_numpy()
            if arr.dtype.kind == "M":
                parts.append(arr.astype("datetime64[us]").astype("int64"))
            else:
                parts.append(pd.to_datetime(pdf[ts_col]).astype("int64").to_numpy() // 1000)
        if not parts:
            return
        ts_arr = np.sort(np.concatenate(parts))
        if ts_arr.size == 0:
            # non-empty chunk list of zero-length arrays (empty Arrow
            # batches) — nothing to do, and gaps[0] below would throw
            return
        if state.exists:
            s0, s1, n = state.get
        else:
            s0, s1, n = int(ts_arr[0]), int(ts_arr[0]), 0
        gaps = np.empty(ts_arr.size, dtype=bool)
        gaps[0] = n > 0 and (int(ts_arr[0]) - s1) > gap_us
        if ts_arr.size > 1:
            gaps[1:] = np.diff(ts_arr) > gap_us
        # segment boundaries WITHIN the batch only (gaps[0] is not a
        # boundary between batch elements — it says whether the open
        # session closes before element 0, handled via prepend below;
        # including index 0 here produced a phantom zero-event segment
        # whenever a batch opened past the gap)
        interior = (np.flatnonzero(gaps[1:]) + 1).astype("int64")
        bounds = np.concatenate(
            (np.array([0], dtype="int64"), interior, np.array([ts_arr.size], dtype="int64"))
        )
        seg_start = ts_arr[bounds[:-1]]
        seg_end = ts_arr[bounds[1:] - 1]
        seg_n = np.diff(bounds)
        if n > 0 and not gaps[0]:
            # first segment extends the open session. min/max-merge the
            # boundaries: a LATE but in-watermark event can sort before
            # the stored session (start must move back) or the whole
            # batch can predate the stored end (end must NOT regress —
            # blindly storing the batch end shrank last_ts and the
            # timeout, closing sessions early with a wrong session_end)
            seg_start = seg_start.copy()
            seg_end = seg_end.copy()
            seg_n = seg_n.copy()
            seg_start[0] = min(s0, int(seg_start[0]))
            seg_end[0] = max(s1, int(seg_end[0]))
            seg_n[0] += n
        prepend = n > 0 and bool(gaps[0])  # open session closes as-is
        # all segments but the last close now; the last stays in state
        c_start, c_end, c_n = seg_start[:-1], seg_end[:-1], seg_n[:-1]
        if prepend:
            c_start = np.concatenate(([s0], c_start))
            c_end = np.concatenate(([s1], c_end))
            c_n = np.concatenate(([n], c_n))
        state.update((int(seg_start[-1]), int(seg_end[-1]), int(seg_n[-1])))
        state.setTimeoutTimestamp((int(seg_end[-1]) + gap_us) // 1000)
        if c_n.size:
            yield pd.DataFrame(
                {
                    user_col: np.full(c_n.size, uid, dtype="int64"),
                    "session_start": c_start.astype("datetime64[us]"),
                    "session_end": c_end.astype("datetime64[us]"),
                    "n_events": c_n.astype("int64"),
                }
            )

    return (
        # project to the two columns the state op reads BEFORE the
        # stateful exchange: every retained column is Arrow-transferred
        # to the Python workers for every row otherwise.
        stream_df.select(user_col, ts_col)
        .withWatermark(ts_col, watermark)
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
