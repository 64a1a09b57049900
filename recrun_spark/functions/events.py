"""Event-stream analytics operators: ordered funnels and retention cohorts.

Beyond-reference analytics ops over the `events` table (the reference,
dstein64/recrun, has no event analytics — these extend the engine the way
the training-data ops do).  Both are pure DataFrame expressions — no UDFs,
no driver-side loops — and both are written so the expensive reduction
happens BEFORE the wide keys fan out:

* ``funnel_stages`` sorts each user's events once (one hash partition by
  user + one sort) and runs every stage qualification as a window over that
  SAME sort, so Catalyst plans a single Exchange + a single Sort for the
  whole cascade regardless of the number of steps.
* ``retention_cohorts`` reduces events -> distinct (user, day) FIRST (at
  web scale events >> user-days by orders of magnitude), computes each
  user's cohort day with a window-min over the already-small frame, and
  counts plain rows — (user, day) is unique after the distinct and the day
  offset is a function of it, so no countDistinct shuffle is needed.
"""

from pyspark.sql import Window
from pyspark.sql import functions as F


def funnel_stages(df, steps, user_col="user_id", type_col="event_type",
                  ts_col="ts", tiebreak_col="event_id"):
    """Ordered-funnel conversion counts.

    A user reaches stage k iff an event of type ``steps[k]`` occurs
    STRICTLY AFTER (in ``(ts, tiebreak)`` row order) some event chain
    matching ``steps[:k]`` — i.e. qualification cascades: a stage-k event
    qualifies only if a qualifying stage-(k-1) event precedes it.  Ties on
    ``ts`` are broken by ``tiebreak_col`` so the ordering (and the oracle)
    is deterministic.

    Returns one row per stage: (stage_idx int, stage string, n_users long).

    Scale shape: every stage is a window over the SAME
    (partitionBy user, orderBy ts, tiebreak) sort, so the plan carries ONE
    Exchange and ONE Sort for any number of steps; the per-user reduction
    and the final 1-row global aggregate are map-side-combinable.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    w_ord = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc())
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)

    out = df
    prev_q = None
    quals = []
    for k, step in enumerate(steps):
        q = f"_q{k}"
        is_step = F.when(F.col(type_col) == F.lit(step), 1).otherwise(0)
        if prev_q is None:
            out = out.withColumn(q, is_step)
        else:
            seen_prev = F.coalesce(F.max(prev_q).over(w_prev), F.lit(0))
            out = out.withColumn(
                q, F.when((F.col(type_col) == F.lit(step))
                          & (seen_prev == 1), 1).otherwise(0))
        quals.append(q)
        prev_q = F.col(q)

    per_user = out.groupBy(user_col).agg(
        *[F.max(q).alias(q) for q in quals])
    totals = per_user.agg(
        *[F.sum(q).cast("long").alias(f"_n{k}")
          for k, q in enumerate(quals)])
    stack_args = ", ".join(
        f"{k}, '{s}', _n{k}" for k, s in enumerate(steps))
    return totals.select(F.expr(
        f"stack({len(steps)}, {stack_args}) AS (stage_idx, stage, n_users)"))


def retention_cohorts(df, user_col="user_id", ts_col="ts"):
    """Cohort retention triangle.

    Cohort = the calendar day of a user's first event; a user is retained
    at offset d iff they have any event on cohort_day + d.  Returns
    (cohort_day date, day_offset long, n_users long).

    Scale shape: events are reduced to distinct (user, day) BEFORE any
    per-user work — the wide raw-event shuffle never happens.  After that
    distinct the (user, day) pair is unique and the offset is a pure
    function of it, so the final count is a plain count(*) — no
    countDistinct expansion.  Day arithmetic is calendar-exact on the NTZ
    timestamps (to_date / datediff), never an instant cast.
    """
    day = F.to_date(F.col(ts_col)).alias("_day")
    days = df.select(F.col(user_col).alias("_user"), day).distinct()
    w_user = Window.partitionBy("_user")
    coh = days.withColumn("cohort_day", F.min("_day").over(w_user))
    return (coh.groupBy(
                "cohort_day",
                F.datediff(F.col("_day"), F.col("cohort_day"))
                 .cast("long").alias("day_offset"))
            .agg(F.count(F.lit(1)).alias("n_users")))


def resample_ffill(df, user_col="user_id", ts_col="ts", val_col="value",
                   tiebreak_col="event_id", step_us=3_600_000_000,
                   max_steps=100_000):
    """Per-key time-grid resampling with forward fill: for every key,
    emit one row per ``step_us`` bucket from its first to its last event
    and carry the last observed value forward across empty buckets —
    the gap-filling step of a metrics/feature pipeline (TimescaleDB's
    time_bucket_gapfill + locf, as a batch operator).

    Semantics (all exact): bucket = epoch-microseconds div step_us (pure
    integer NTZ arithmetic — the sessionizer discipline, never a
    tz-dependent cast); the value recorded for a non-empty bucket is the
    LAST event's in ``(ts, tiebreak)`` order (deterministic under ties);
    ``filled`` marks carried rows.  Values pass through untouched, so
    doubles value-hash cross-engine.

    Scale shape: events reduce per (key, bucket) FIRST via one
    max(struct(ts_us, tiebreak, value)) keyed aggregate (at web scale
    events ≫ buckets); the grid explodes off the per-key [min, max]
    bucket span (``sequence`` — fan-out bounded by ``max_steps``, loud
    ANSI error beyond, never silent truncation); the forward fill is a
    last-non-null window PARTITIONED by key over the already-small grid
    frame.  No UDFs, no single-reducer exchange.

    Returns (user_col, bucket_start_us:long, value, filled:boolean)."""
    if step_us <= 0:
        raise ValueError(f"step_us must be positive, got {step_us}")
    ts_us = F.expr(
        f"timestampdiff(MICROSECOND, timestamp'1970-01-01 00:00:00', "
        f"{ts_col})")
    per_bucket = (
        df.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
                 & F.col(val_col).isNotNull())
        .select(F.col(user_col),
                (ts_us - (ts_us % step_us)).alias("_b0"),
                F.struct(ts_us.alias("_t"),
                         F.col(tiebreak_col).alias("_k"),
                         F.col(val_col).alias("v")).alias("_s"))
        .groupBy(user_col, "_b0")
        .agg(F.max("_s").alias("_s"))
        .select(user_col, "_b0", F.col("_s.v").alias("_obs")))
    span = (per_bucket.groupBy(user_col)
            .agg(F.min("_b0").alias("_lo"), F.max("_b0").alias("_hi")))
    # ANSI: sequence() raises if the span exceeds its element cap; gate
    # explicitly so the error names the knob
    # the guard column FEEDS the sequence start (multiply by 1) so
    # Catalyst cannot prune the raise_error away as unused
    chk = (F.when(F.expr(f"(_hi - _lo) div {step_us}") + 1 <= max_steps,
                  F.lit(1).cast("long"))
           .otherwise(F.raise_error(F.format_string(
               "resample_ffill: key span exceeds max_steps=%s",
               F.lit(str(max_steps))))))
    grid = (span
            .select(user_col,
                    F.explode(F.sequence(
                        F.col("_lo") * chk, F.col("_hi"),
                        F.lit(step_us).cast("long")))
                    .alias("bucket_start_us")))
    w = (Window.partitionBy(user_col).orderBy("bucket_start_us")
         .rowsBetween(Window.unboundedPreceding, 0))
    joined = grid.join(
        per_bucket.withColumnRenamed("_b0", "bucket_start_us"),
        [user_col, "bucket_start_us"], "left")
    return (joined
            .withColumn("value", F.last("_obs", ignorenulls=True).over(w))
            .withColumn("filled", F.col("_obs").isNull())
            .select(user_col, "bucket_start_us", "value", "filled"))


def mad_outliers(df, group_col="event_type", val_col="value",
                 id_col="event_id", k_num=5, k_den=1, cents_scale=100):
    """Robust per-group outlier detection: flag rows whose deviation from
    the group median exceeds (k_num/k_den) × MAD (median absolute
    deviation — the Hampel filter, the robust-statistics replacement for
    z-scores: one wild value shifts a mean/stddev fence arbitrarily but
    moves a median/MAD fence by at most one rank).

    Exact and engine-portable: values are fixed-pointed to integer cents
    (round(v·scale) — shared IEEE double path), and both medians use the
    pinned LOWER-median rank rule over the sorted multiset: the smallest
    value whose cumulative count reaches ⌈n/2⌉.  All comparisons are
    integers — the flag set value-hashes bit-for-bit cross-engine.

    Scale shape — the grouped-exact-median trap avoided: medians are read
    from PER-VALUE COUNT tables (groupBy(group, cents) with map-side
    combine), so the rank scan windows over DISTINCT VALUES per group
    (bounded by value cardinality — at 2-dp cents, thousands), never over
    raw rows; n per group comes off the same count table.  Raw rows are
    touched exactly twice (cents projection, final flag filter+join) with
    no row-level window at all — a group with 10^10 rows costs two keyed
    aggregates over its distinct cents, not a 10^10-row sort.

    Returns the flagged rows: (id, group, cents, dev, med, mad)."""
    g, v = F.col(group_col), F.col(val_col)
    rows = df.select(F.col(id_col).alias("_id"), g.alias("_g"),
                     F.round(v * cents_scale, 0).cast("long").alias("cents"))

    def lower_median(frame, val):
        """Median of the multiset (group, val, c): smallest val whose
        running count reaches ceil(n/2) — windows over distinct values."""
        counts = frame.groupBy("_g", val).agg(
            F.count(F.lit(1)).cast("long").alias("c"))
        w = (Window.partitionBy("_g").orderBy(F.col(val).asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        n = counts.groupBy("_g").agg(F.sum("c").alias("n"))
        cum = counts.withColumn("cum", F.sum("c").over(w)).join(n, "_g")
        # cum ≥ ⌈n/2⌉  ⇔  2·cum ≥ n  (integers)
        return (cum.where(F.col("cum") * 2 >= F.col("n"))
                .groupBy("_g").agg(F.min(val).alias("med")))

    med = lower_median(rows, "cents")
    devs = (rows.join(med, "_g")
            .withColumn("dev", F.abs(F.col("cents") - F.col("med"))))
    mad = lower_median(devs, "dev").withColumnRenamed("med", "mad")
    return (devs.join(mad, "_g")
            .where(F.col("dev") * F.lit(k_den) > F.col("mad") * F.lit(k_num))
            .select(F.col("_id").alias(id_col), F.col("_g").alias(group_col),
                    "cents", "dev", "med", "mad"))


def hourly_bursts(df, trail_hours: int = 3, burst_ratio_bp: int = 20000,
                  type_col: str = "event_type", ts_col: str = "ts"):
    """BURST DETECTION per event type (the Kleinberg'02 problem reduced to
    its production form — trailing-window rate ratio, as in monitoring /
    trending pipelines): an hour is a burst when its count reaches
    ``burst_ratio_bp``/10⁴ × the trailing ``trail_hours``-hour average.

    Everything is integer: hour_id = epoch-µs div 3600000000 (NTZ-safe —
    the zorder/decayed-counts convention), and the ratio is kept as
    (10⁴·trail_hours·n) div trail_n basis points, so the float average
    never exists and the value hashes cross-engine.  The trailing sum is
    a RANGE window on hour_id (calendar hours, not present rows — silent
    hours shrink the trailing mass instead of being skipped), emitted
    only where trailing history exists.

    Scale shape: events reduce to the (type, hour) count table FIRST
    (map-side combinable — the events_markov denominator discipline), so
    the window runs over |types|·|hours| rows, never raw events; one
    Exchange on type, one sort, zero joins.

    Returns (event_type, hour_id:long, n:long, trail_n:long,
    burst_bp:long, is_burst:boolean) for hours with trail_n > 0."""
    if trail_hours < 1:
        raise ValueError(f"trail_hours must be >= 1, got {trail_hours}")
    return bursts_from_hour_counts(hour_counts(df, type_col, ts_col),
                                   trail_hours, burst_ratio_bp)


def hour_counts(df, type_col: str = "event_type", ts_col: str = "ts"):
    """(event_type, hour_id, n) — the per-type hourly count table
    (hour_id = epoch-µs div 3600000000).  Counts MERGE by cell-wise sum,
    so per-micro-batch tables written idempotently and summed by a
    reader equal the batch table — the streaming-bursts building block
    (the CMS merge discipline, streaming/freq.py)."""
    us = (f"cast(timestampdiff(MICROSECOND, "
          f"timestamp'1970-01-01 00:00:00', {ts_col}) as bigint)")
    return (df.groupBy(F.col(type_col).alias("event_type"),
                       F.expr(f"({us}) div 3600000000").alias("hour_id"))
            .agg(F.count(F.lit(1)).cast("long").alias("n")))


def bursts_from_hour_counts(c, trail_hours: int = 3,
                            burst_ratio_bp: int = 20000):
    """Burst flags from an (event_type, hour_id, n) count table — the
    window stage of ``hourly_bursts``, shared by the batch entry and the
    streaming reader so their semantics cannot drift."""
    w = (Window.partitionBy("event_type").orderBy("hour_id")
         .rangeBetween(-trail_hours, -1))
    t = c.withColumn("trail_n", F.sum("n").over(w))
    return (t.where(F.col("trail_n") > 0)
            .select("event_type", "hour_id", "n",
                    F.col("trail_n").cast("long").alias("trail_n"),
                    F.expr(f"10000 * {trail_hours} * n div trail_n")
                    .cast("long").alias("burst_bp"))
            .withColumn("is_burst",
                        F.col("burst_bp") >= F.lit(burst_ratio_bp)))
