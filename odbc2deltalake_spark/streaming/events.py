"""Streaming event transformations — watermarked windows and dedup.

The reference has no streaming operators (SURVEY.md §2.9); these extend the
engine for the event-stream side of a data platform, using the standard
Structured Streaming constructs: event-time watermarks bound state, window
aggregation does the rollup, ``dropDuplicates`` within the watermark gives
at-least-once → effectively-once event handling.

Each transformation takes/returns a DataFrame, so the same code runs on a
batch DataFrame (tests compare against the batch oracle) and a streaming
one — Spark's unified API guarantees the semantics match for append-mode
queries once the watermark closes a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_rollup_stream(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window rollup per event_type with late-data bound.

    On a stream: state for a window is dropped once the watermark passes
    window_end + delay; later events are discarded (counted by the
    numLateRows metric). On a batch frame the same plan is a plain window
    aggregation."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark_delay)
    return (
        df.groupBy(F.window(ts_col, window_duration).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def deduped_stream(
    events: DataFrame,
    key_cols: list[str],
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Exactly-once-per-key event feed from an at-least-once input:
    dropDuplicates bounded by the event-time watermark (state for a key is
    held only within the delay)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark_delay)
        return df.dropDuplicatesWithinWatermark(key_cols)
    return df.dropDuplicates(key_cols)


def sessionize_batch(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Batch gap-sessionization (lag + running sum) — the same algebra the
    registry's ev_sessionize query pins against DuckDB; bounds emitted as
    integer epoch-micros."""
    from pyspark.sql import Window as W

    gap_us = gap_minutes * 60 * 1_000_000
    w = W.partitionBy(user_col).orderBy(ts_col)
    gap = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(F.col(ts_col)).over(w))
    return (
        events.withColumn(
            "__new", F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
        )
        .withColumn(
            "session_id",
            F.sum("__new").over(w.rowsBetween(W.unboundedPreceding, 0)),
        )
        .groupBy(user_col, "session_id")
        .agg(
            F.unix_micros(F.min(ts_col)).alias("session_start_us"),
            F.unix_micros(F.max(ts_col)).alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("session_id")
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Custom stateful streaming operator: gap-based sessionization via
    ``applyInPandasWithState`` (the construct for operators Structured
    Streaming lacks natively — session windows with per-key state and
    event-time timeouts).

    Watermark-correct by construction: a session is emitted ONLY when the
    watermark has passed ``session_end + gap`` — at that point no
    non-late event can extend or bridge it. Until then candidate sessions
    (merged event intervals) wait in state; late events within the
    watermark land in, extend, or bridge them. State per key is a handful
    of interval triples bounded by the watermark delay, and the event-time
    timeout flushes closed sessions even if the key never sees another
    event — both state growth and emission latency are bounded.

    On a batch frame this dispatches to :func:`sessionize_batch` (same
    output schema/semantics; a batch has no open tail).
    """
    if not events.isStreaming:
        return sessionize_batch(events, gap_minutes, ts_col, user_col)

    import pandas as pd

    gap_us = gap_minutes * 60 * 1_000_000
    out_schema = (
        f"{user_col} long, session_start_us long, session_end_us long, "
        "n_events long"
    )
    state_schema = "starts array<long>, ends array<long>, counts array<long>"

    def fn(key, pdfs, state):
        (user,) = key
        wm_us = state.getCurrentWatermarkMs() * 1000
        intervals: list[list[int]] = []
        if state.exists:
            starts, ends, counts = state.get
            intervals = [[s, e, n] for s, e, n in zip(starts, ends, counts)]
        for pdf in pdfs:
            ts_us = (
                pd.to_datetime(pdf[ts_col])
                .astype("datetime64[us]")
                .astype("int64")
            )
            intervals.extend([int(t), int(t), 1] for t in ts_us)
        intervals.sort()
        merged: list[list[int]] = []
        for s, e, n in intervals:
            if merged and s - merged[-1][1] <= gap_us:
                merged[-1][1] = max(merged[-1][1], e)
                merged[-1][2] += n
            else:
                merged.append([s, e, n])
        closed = [iv for iv in merged if iv[1] + gap_us < wm_us]
        still_open = [iv for iv in merged if iv[1] + gap_us >= wm_us]
        if still_open:
            state.update((
                [iv[0] for iv in still_open],
                [iv[1] for iv in still_open],
                [iv[2] for iv in still_open],
            ))
            # fire when the watermark passes the earliest possible close
            next_close_ms = min(iv[1] for iv in still_open) // 1000 + gap_minutes * 60_000
            state.setTimeoutTimestamp(max(next_close_ms, wm_us // 1000 + 1))
        else:
            state.remove()
        if closed:
            yield pd.DataFrame(
                {
                    user_col: [user] * len(closed),
                    "session_start_us": [iv[0] for iv in closed],
                    "session_end_us": [iv[1] for iv in closed],
                    "n_events": [iv[2] for iv in closed],
                }
            )

    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", "EventTimeTimeout"
        )
    )


def clicks_purchases_join_stream(
    events: DataFrame,
    join_window: str = "30 minutes",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream self-join: each 'click' inner-joined to
    same-user 'purchase' events in the preceding ``join_window``.

    Both sides carry event-time watermarks and the join condition bounds
    purchase_ts to [click_ts - window, click_ts], so Spark can expire
    buffered rows once the watermark passes their reach — state stays
    bounded by window + delay instead of growing with the stream. Inner
    join: matches emit as soon as both sides have arrived (the watermark
    only gates state cleanup), so the streamed result equals the batch
    join exactly. On a batch frame the same plan is a plain
    condition join."""
    is_stream = events.isStreaming
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    purch = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    )
    if is_stream:
        clicks = clicks.withWatermark("c_ts", watermark_delay)
        purch = purch.withWatermark("p_ts", watermark_delay)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") <= F.col("c_ts"))
        & (F.col("p_ts") >= F.col("c_ts") - F.expr(f"INTERVAL {join_window}"))
    )
    return clicks.join(purch, cond).select(
        "click_id",
        F.col("c_user").alias("user_id"),
        F.unix_micros(F.col("c_ts")).alias("click_ts_us"),
        F.unix_micros(F.col("p_ts")).alias("purchase_ts_us"),
        "purchase_value",
    )


def funnel_steps_batch(events: DataFrame) -> DataFrame:
    """Per-user funnel step completions (batch twin of
    :func:`funnel_stream`): (user_id, step, step_name, ts_us) with
    min-timestamp entry semantics — t1 = first 'view', t2 = first
    'click' at/after t1, t3 = first 'purchase' at/after t2. The same
    algebra the registry's driver-verified ev_funnel aggregates."""
    us = F.unix_micros(F.col("ts"))
    s1 = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(us).alias("t1"))
    )
    s2 = (
        events.filter(F.col("event_type") == "click")
        .select("user_id", us.alias("c_us"))
        .join(s1, "user_id")
        .filter(F.col("c_us") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("c_us").alias("t2"))
    )
    s3 = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", us.alias("p_us"))
        .join(s2, "user_id")
        .filter(F.col("p_us") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("p_us").alias("t3"))
    )

    def rows(df, col, step, name):
        return df.select(
            "user_id",
            F.lit(step).cast("long").alias("step"),
            F.lit(name).alias("step_name"),
            F.col(col).alias("ts_us"),
        )

    return (
        rows(s1, "t1", 1, "view")
        .unionByName(rows(s2, "t2", 2, "click"))
        .unionByName(rows(s3, "t3", 3, "purchase"))
    )


def funnel_stream(
    events: DataFrame,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Custom stateful streaming operator: per-user funnel state machine
    (view → click → purchase) via ``applyInPandasWithState``.

    Watermark-correct emission: a step time is FINAL once the watermark
    passes it — any event that could still lower it would carry an
    earlier event time and thus be late-beyond-watermark. Because
    t1 ≤ t2 ≤ t3 by construction, ``wm > t_n`` alone finalizes step n
    (it implies every upstream step is final too). Until a step's
    gate time is final, the candidate click/purchase timestamps that
    could still become its minimum wait in state, pruned to
    ``ts >= min(gate_candidate, wm)`` — everything below that bound can
    never satisfy the ordering constraint again, so state stays bounded
    by the watermark delay. An event-time timeout flushes newly-final
    steps even if the user never produces another event.

    On a batch frame this dispatches to :func:`funnel_steps_batch`.
    """
    if not events.isStreaming:
        return funnel_steps_batch(events)

    import pandas as pd

    out_schema = "user_id long, step long, step_name string, ts_us long"
    state_schema = (
        "mask int, t1 long, t2 long, t3 long, "
        "clicks array<long>, purchases array<long>"
    )
    _NONE = -1
    _NAMES = {1: "view", 2: "click", 3: "purchase"}

    def fn(key, pdfs, state):
        (user,) = key
        wm_us = state.getCurrentWatermarkMs() * 1000
        mask, t1, t2, t3 = 0, _NONE, _NONE, _NONE
        clicks: list[int] = []
        purchases: list[int] = []
        if state.exists:
            mask, t1, t2, t3, clicks, purchases = state.get
            clicks, purchases = list(clicks), list(purchases)
        for pdf in pdfs:
            ts_us = (
                pd.to_datetime(pdf["ts"])
                .astype("datetime64[us]")
                .astype("int64")
            )
            for et, t in zip(pdf["event_type"], ts_us):
                t = int(t)
                if et == "view":
                    t1 = t if t1 == _NONE else min(t1, t)
                elif et == "click":
                    clicks.append(t)
                elif et == "purchase":
                    purchases.append(t)
        # recompute candidates from the ordering constraints — but NEVER
        # a step already finalized: its buffer was cleared on emission,
        # so recomputing from later arrivals would RAISE the gate (e.g. a
        # post-finalization click would overwrite t2 and disqualify an
        # earlier-but-valid purchase)
        if t1 != _NONE and not mask & 2:
            elig = [c for c in clicks if c >= t1]
            t2 = min(elig) if elig else _NONE
        if t2 != _NONE and not mask & 4:
            elig = [p for p in purchases if p >= t2]
            t3 = min(elig) if elig else _NONE
        # emit newly-final steps (wm strictly past the candidate time)
        out_steps, out_ts = [], []
        for step, bit, t in ((1, 1, t1), (2, 2, t2), (3, 4, t3)):
            if t != _NONE and not mask & bit and t < wm_us:
                mask |= bit
                out_steps.append(step)
                out_ts.append(t)
        if mask & 4:
            state.remove()  # funnel complete; nothing left to finalize
        else:
            # prune state: a click below min(t1, wm) / purchase below
            # min(t2, wm) can never satisfy its gate again
            cb = wm_us if t1 == _NONE else min(t1, wm_us)
            pb = wm_us if t2 == _NONE else min(t2, wm_us)
            clicks = [c for c in clicks if c >= cb] if not mask & 2 else []
            purchases = (
                [p for p in purchases if p >= pb] if not mask & 4 else []
            )
            state.update((mask, t1, t2, t3, clicks, purchases))
            pending = [
                t
                for bit, t in ((1, t1), (2, t2), (4, t3))
                if t != _NONE and not mask & bit
            ]
            if pending:
                state.setTimeoutTimestamp(
                    max(min(pending) // 1000 + 1, wm_us // 1000 + 1)
                )
        if out_steps:
            yield pd.DataFrame(
                {
                    "user_id": [user] * len(out_steps),
                    "step": out_steps,
                    "step_name": [_NAMES[s] for s in out_steps],
                    "ts_us": out_ts,
                }
            )

    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", "EventTimeTimeout"
        )
    )
