"""Gap-based sessionization over event streams — the classic event-
analytics rollup a consumer of the reference's replicated topics builds
next to the data (docs/index.md:32-52 — mirrored topics feeding local
analytics; the events here are the timestamped-producer payloads of
SURVEY §2.1 S2).

Semantics match Spark's own session_window exactly: a user's events
sorted by time split into a new session whenever the inactivity since the
previous event reaches ``gap`` (diff >= gap — an event landing exactly on
the boundary starts a new session, the same rule session_window applies);
per-session stats aggregate the member events. Everything is deterministic (microsecond-exact gap compare
via unix_micros, (ts, event_id) tiebreak for equal timestamps), so the
whole rollup carries an exact DuckDB oracle.

Scale shape at 10^10 events:
  * ONE shuffle on the user key; the lag/cumsum window and the final
    per-session aggregate share that partitioning (the groupBy keys are
    a superset of the window partition key, so no second exchange).
  * Per-user work is a linear scan of that user's events in time order —
    the same cost any sessionizer pays. A pathological single hot user
    serializes into one task here — use :func:`session_stats_scalable`
    (two-phase: parallel within time slices, O(sessions) stitch) when one
    user's event count is itself task-sized.
  * For CONTINUOUS sessionization use Structured Streaming's
    ``session_window`` with a watermark; this operator is the batch/
    backfill twin over the replicated table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Label every event with its (user, session_id): session_id is the
    running count of gap-exceeding boundaries, 1-based per user."""
    w = W.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    # parquet TIMESTAMP_NTZ + UTC session tz (session.py pins it): the cast
    # is wall-clock identity, unix_micros is then the naive epoch — exactly
    # DuckDB's epoch_us over the same naive value
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    new_session = F.when(
        prev.isNull() | ((us - prev) >= gap_minutes * 60_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    wc = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return df.withColumn("session_id", F.sum(new_session).over(wc).cast("long"))


def session_stats(
    df: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-session rollup: bounds, event/type counts, value total, exact
    microsecond duration. One exchange total (see module docstring)."""
    s = sessionize(df, gap_minutes, user_col, ts_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return (
        s.groupBy(user_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct(type_col).alias("n_event_types"),
            F.round(F.sum(value_col), 4).alias("total_value"),
            (F.max(us) - F.min(us)).alias("duration_us"),
        )
    )


def session_stream(
    spark,
    events_path: str,
    read_schema,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    type_col: str = "event_type",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin: native ``session_window`` + watermark over an event
    tail — the CONTINUOUS sessionizer (T9 late-data handling: events later
    than the watermark are dropped from the rollup; state for a session is
    evicted once the watermark passes its close, so months of streaming
    hold only the trailing horizon).

    Append-mode contract: a session row emits ONCE, when the watermark
    passes its close (window end = last event + gap, so
    ``session_end = window.end - gap`` is the last event time — the exact
    batch ``session_stats`` value). Parity with the batch twin is asserted
    in tests; ``countDistinct`` is not available in streaming, so the type
    count is ``size(collect_set(...))`` — identical values, bounded by the
    type cardinality.
    """
    src = spark.readStream.schema(read_schema)
    if max_files_per_trigger is not None:
        src = src.option("maxFilesPerTrigger", str(max_files_per_trigger))
    events = src.parquet(events_path)
    ts = F.col(ts_col).cast("timestamp")
    return (
        events.withColumn("_ts", ts)
        .withWatermark("_ts", watermark)
        .groupBy(F.session_window(F.col("_ts"), gap), F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.size(F.collect_set(type_col)).alias("n_event_types"),
            F.round(F.sum(value_col), 4).alias("total_value"),
            F.min("_ts").alias("session_start"),
            F.max("_ts").alias("session_end"),
        )
        .select(
            user_col,
            "session_start",
            "session_end",
            F.col("session_window.end").alias("session_close"),
            "n_events",
            "n_event_types",
            "total_value",
        )
    )


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel analysis: for each user, the deepest step reached
    with each step STRICTLY AFTER the previous one (first qualifying
    occurrence — the standard conversion-funnel rule), then per-step user
    counts and conversion vs step 1.

    One aggregate over the events (map-side combined min-per-step
    candidates can't work for ordered funnels, so this folds each user's
    typed timestamps with ``min_by``-style conditional aggregation in TWO
    passes: collect first-occurrence times per step, then walk the step
    chain driver-free with a single projection). Shuffle: one exchange on
    the user key + one tiny final rollup."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # pass 1: per user, the ordered list of (step, time) candidates —
    # earliest time of each step AFTER any given time is derivable from
    # the sorted event times per (user, step)
    typed = df.filter(F.col(type_col).isin(steps)).select(
        user_col, F.col(type_col).alias("_step"), us.alias("_us")
    )
    per = typed.groupBy(user_col).pivot("_step", steps).agg(
        F.sort_array(F.collect_list("_us")).alias("_times")
    )
    # pass 2: walk the chain — step k's time is the first occurrence
    # strictly after step k-1's chosen time (null if none)
    out = per
    prev = None
    for i, s in enumerate(steps):
        times = F.coalesce(F.col(f"`{s}`"), F.array().cast("array<long>"))
        if prev is None:
            t = F.try_element_at(times, F.lit(1))
        else:
            after = F.filter(times, lambda x: x > prev)
            t = F.try_element_at(after, F.lit(1))
        out = out.withColumn(f"_t{i}", t)
        prev = F.col(f"_t{i}")
    # chain property: _t{i} is null whenever _t{i-1} is, so the depth is
    # simply the count of non-null chain times
    depth = sum(
        (F.col(f"_t{i}").isNotNull().cast("int") for i in range(len(steps))),
        F.lit(0),
    )
    out = out.withColumn("_depth", depth)
    rows = []
    for i, s in enumerate(steps):
        rows.append(
            out.filter(F.col("_depth") >= i + 1).agg(
                F.lit(i + 1).alias("step"),
                F.lit(s).alias("step_name"),
                F.count(F.lit(1)).cast("long").alias("n_users"),
            )
        )
    res = rows[0]
    for r in rows[1:]:
        res = res.unionByName(r)
    return res


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_us: int = 7 * 86400 * 1_000_000,
) -> DataFrame:
    """Cohort retention: users grouped by their FIRST active period (epoch
    week by default), counted in every later period they return — the
    classic retention triangle. Integer period arithmetic end-to-end
    (``div`` on microseconds), so the oracle is exact.

    Scale shape: distinct (user, period) first (map-side combined — the
    shuffle carries user-periods, not events), then the cohort label is a
    per-user window MIN sharing that partitioning, then one rollup on
    (cohort, offset) — period-cardinality-squared rows at most."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    acts = (
        df.select(F.col(user_col).alias("_u"), us.alias("_us"))
        .select("_u", F.expr(f"_us div {period_us}").alias("_wk"))
        .distinct()
    )
    w = W.partitionBy("_u")
    labeled = acts.withColumn("cohort_week", F.min("_wk").over(w))
    return (
        labeled.groupBy(
            "cohort_week",
            (F.col("_wk") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("_u").cast("long").alias("n_users"))
    )


def session_stats_scalable(
    df: DataFrame,
    gap_minutes: int = 30,
    slice_minutes: int = 1440,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    type_col: str = "event_type",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Two-phase sessionization — the hot-user scale path.

    The direct sessionizer serializes each user into one task (gap splits
    are a running dependency over that user's FULL event sequence). This
    variant breaks the dependency chain at coarse time-slice boundaries:

      phase 1  sessionize within (user, slice) — slices are independent,
               so a user with 10^8 events parallelizes across
               events/slice-width tasks; emits one mergeable summary row
               per LOCAL session (bounds, count, value sum, type set).
      phase 2  stitch across consecutive slices with the SAME >= gap rule
               applied to session bounds — a per-user sequential pass, but
               over SESSION rows (orders of magnitude fewer than events),
               then merge stitched groups.

    Exactly equal to :func:`session_stats` by construction (a session
    crossing a slice boundary is split locally and re-joined in phase 2;
    equal timestamps share a slice, so the tiebreak order is preserved) —
    the driver oracle asserts hash equality against the SAME SQL the
    direct form uses. ``slice_minutes`` must be >= ``gap_minutes``."""
    if slice_minutes < gap_minutes:
        raise ValueError("slice must be at least the gap wide")
    gap_us = gap_minutes * 60_000_000
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = df.select(
        F.col(user_col).alias("_u"),
        us.alias("_us"),
        F.col(ts_col).alias("_ts"),
        F.col(order_tiebreak).alias("_tb"),
        F.col(value_col).alias("_v"),
        F.col(type_col).alias("_t"),
    ).withColumn("_slice", F.expr(f"_us div {slice_minutes * 60_000_000}"))

    # phase 1: local sessions inside each (user, slice)
    w1 = W.partitionBy("_u", "_slice").orderBy("_ts", "_tb")
    prev = F.lag("_us").over(w1)
    new_local = F.when(
        prev.isNull() | ((F.col("_us") - prev) >= gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    w1c = w1.rowsBetween(W.unboundedPreceding, W.currentRow)
    local = (
        ev.withColumn("_ls", F.sum(new_local).over(w1c))
        .groupBy("_u", "_slice", "_ls")
        .agg(
            F.min("_us").alias("_start_us"),
            F.max("_us").alias("_end_us"),
            F.min("_ts").alias("_start_ts"),
            F.max("_ts").alias("_end_ts"),
            F.count(F.lit(1)).alias("_n"),
            F.sum("_v").alias("_sum_v"),
            F.collect_set("_t").alias("_types"),
        )
    )

    # phase 2: stitch — the same gap rule over SESSION rows per user
    w2 = W.partitionBy("_u").orderBy("_start_us", "_slice", "_ls")
    prev_end = F.lag("_end_us").over(w2)
    new_global = F.when(
        prev_end.isNull() | ((F.col("_start_us") - prev_end) >= gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    w2c = w2.rowsBetween(W.unboundedPreceding, W.currentRow)
    stitched = local.withColumn("_gs", F.sum(new_global).over(w2c))
    return (
        stitched.groupBy("_u", "_gs")
        .agg(
            F.min("_start_ts").alias("session_start"),
            F.max("_end_ts").alias("session_end"),
            F.sum("_n").cast("long").alias("n_events"),
            F.size(F.array_distinct(F.flatten(F.collect_list("_types"))))
            .cast("long").alias("n_event_types"),
            F.round(F.sum("_sum_v"), 4).alias("total_value"),
            (F.max("_end_us") - F.min("_start_us")).alias("duration_us"),
        )
        .select(
            F.col("_u").alias(user_col),
            F.col("_gs").alias("session_id"),
            "session_start", "session_end", "n_events", "n_event_types",
            "total_value", "duration_us",
        )
    )
