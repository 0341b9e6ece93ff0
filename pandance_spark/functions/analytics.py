"""Ordered-event product analytics: funnels and cohort retention.

The two classic event-stream questions a relational engine's users ask
after sessionization: "how far do users get through this ordered list
of steps?" (funnel) and "of the users who arrived in period X, how
many came back in period X+n?" (cohort retention).

Spark-first shape
-----------------
Both operators make ONE pass over the event table and shuffle once on
the user key; everything downstream happens on user-sized or
aggregate-sized tables.  The funnel's sequential matching — step i
counts only when it happens STRICTLY AFTER the matched time of step
i-1 — is a left fold over each user's time-sorted events expressed
with ``aggregate``/higher-order functions, entirely JVM-side (no UDF,
no window over raw events).  Per-user state is one (reached, ts)
struct; per-user memory is the user's own event list, the same bound
``sessionize`` carries.

At 100 TB: the user-key shuffle is the cost, and it is the *minimum*
cost for per-user sequence semantics; heavy users bound a task by
their own event count, never by the corpus.  The funnel summary and
the cohort matrix are aggregate-sized (≤ steps, ≤ horizon²/width²
rows).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "funnel_steps",
    "funnel_summary",
    "cohort_retention",
    "cumulative_users",
    "step_transitions",
    "ab_summary",
]


def funnel_steps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    step_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Per-user furthest step reached, IN ORDER: a user has reached
    step ``i`` iff an event with ``step_col == steps[i]`` occurred
    strictly after the event that matched step ``i-1`` (the standard
    chained-first-occurrence funnel — equivalent to ``t_1 = min ts of
    step 1; t_i = min ts of step i with ts > t_{i-1}``; the fold is
    tie-order-independent because an advance requires strictly
    increasing time).

    Returns one row per user that emitted at least one funnel event:
    ``(user_col, steps_reached int in [0, len(steps)], last_step)``.

    Events with a NULL user or NULL time, and events whose step is not
    in ``steps``, are ignored (an anonymous event cannot be attributed
    to a funnel, and a timeless one cannot be ordered — same convention
    as :func:`cohort_retention`).
    """
    steps = list(steps)
    if not steps:
        raise ValueError("steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError("steps must be distinct")
    k = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])

    ev = df.select(
        F.col(user_col),
        F.col(ts_col).alias("__t"),
        F.col(step_col).alias("__s"),
    ).filter(
        F.col(user_col).isNotNull()
        & F.col("__t").isNotNull()
        & F.col("__s").isin(steps)
    )

    per_user = ev.groupBy(user_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("__t").alias("t"), F.col("__s").alias("s")))
        ).alias("__evs")
    )

    init = F.struct(
        F.lit(0).alias("reached"),
        F.lit(None).cast(ev.schema["__t"].dataType).alias("t"),
    )

    def advance(acc, e):
        # least() keeps the index in bounds for ANSI element_at even
        # when the funnel is already complete (the reached<k conjunct
        # then blocks the advance)
        need = F.element_at(steps_arr, F.least(acc["reached"] + 1, F.lit(k)))
        adv = (
            (acc["reached"] < k)
            & (e["s"] == need)
            & (acc["t"].isNull() | (e["t"] > acc["t"]))
        )
        return F.when(
            adv,
            F.struct((acc["reached"] + 1).alias("reached"), e["t"].alias("t")),
        ).otherwise(acc)

    state = F.aggregate("__evs", init, advance)
    return per_user.select(
        user_col,
        state["reached"].alias("steps_reached"),
        F.when(
            state["reached"] > 0, F.element_at(steps_arr, state["reached"])
        ).alias("last_step"),
    )


def funnel_summary(per_user: DataFrame, steps: Sequence[str]) -> DataFrame:
    """Collapse :func:`funnel_steps` output into the funnel table:
    one row per step with the number of users reaching AT LEAST that
    step — ``(step_idx 1-based, step, users)``.  A groupBy over the
    (≤ steps+1)-row reached distribution plus a running sum; the user
    table is touched once.
    """
    steps = list(steps)
    dist = per_user.groupBy("steps_reached").agg(F.count("*").alias("n"))
    idx = F.explode(F.array(*[F.lit(i + 1) for i in range(len(steps))])).alias(
        "step_idx"
    )
    grid = dist.sparkSession.range(1).select(idx)
    names = F.array(*[F.lit(s) for s in steps])
    return (
        grid.join(dist, dist["steps_reached"] >= grid["step_idx"], "left")
        .groupBy("step_idx")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("users"))
        .select(
            "step_idx",
            F.element_at(names, F.col("step_idx").cast("int")).alias("step"),
            "users",
        )
    )


def ab_summary(
    df: DataFrame,
    unit_col: str,
    arm_col: str,
    success: Column,
    round_to: int = 6,
) -> DataFrame:
    """Experiment-arm summary with the two-proportion z statistic:
    per arm, distinct units, converted units (``success`` true for ANY
    of the unit's rows — unit-level conversion, the correct grain when
    events repeat per user), conversion rate, and each arm's z-score
    against the POOLED rate of all arms (the standard first-look
    readout; for pairwise contrasts feed the counts to your stats
    stack).

    Two aggregates: unit-level any-success (one shuffle on the unit
    key), then the arms-sized rollup; z computed in-plan from exact
    integer counts (rate/z rounded to ``round_to`` for cross-engine
    comparison — sqrt is IEEE-exact, so both engines agree at any
    sane rounding).
    """
    units = (
        df.select(F.col(unit_col), F.col(arm_col), success.alias("__s"))
        .filter(F.col(unit_col).isNotNull() & F.col(arm_col).isNotNull())
        .groupBy(unit_col, arm_col)
        .agg(F.max(F.coalesce(F.col("__s"), F.lit(False))).alias("__conv"))
    )
    arms = units.groupBy(arm_col).agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum(F.col("__conv").cast("long")).alias("n_converted"),
    )
    # arms-sized and it feeds BOTH the total aggregate and the join —
    # checkpoint so the event table is scanned once
    arms = arms.localCheckpoint(eager=True)
    tot = arms.agg(
        F.sum("n_units").alias("__tn"), F.sum("n_converted").alias("__tc")
    )
    j = arms.crossJoin(F.broadcast(tot))
    p_arm = F.col("n_converted") / F.col("n_units")
    p_pool = F.col("__tc") / F.col("__tn")
    se = F.sqrt(
        p_pool * (1 - p_pool) * (1.0 / F.col("n_units") + 1.0 / F.col("__tn"))
    )
    z = F.when(se > 0, (p_arm - p_pool) / se).otherwise(F.lit(0.0))
    return j.select(
        arm_col,
        "n_units",
        "n_converted",
        F.round(p_arm, round_to).alias("rate"),
        F.round(z, round_to).alias("z_vs_pooled"),
    )


def step_transitions(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    step_col: str,
) -> DataFrame:
    """Per-user next-step transition counts — the Sankey / Markov-chain
    source table: for each consecutive event pair in a user's
    time-ordered stream, one (from_step, to_step) observation;
    ``n_transitions`` counts pairs, ``n_users`` distinct users making
    the transition.  Consecutive means adjacent after sorting by
    (time, step) — the step tie-break makes same-timestamp adjacency
    deterministic under any partitioning.

    ONE window shuffle on the user key (the minimum for per-user
    sequence semantics), then an aggregate over the transition pairs;
    the output is steps²-sized.  NULL users/times are excluded (the
    module convention).
    """
    from pyspark.sql import Window

    ev = df.select(
        F.col(user_col),
        F.col(ts_col).alias("__t"),
        F.col(step_col).alias("__s"),
    ).filter(
        F.col(user_col).isNotNull()
        & F.col("__t").isNotNull()
        & F.col("__s").isNotNull()
    )
    w = Window.partitionBy(user_col).orderBy(
        F.col("__t").asc(), F.col("__s").asc()
    )
    pairs = ev.withColumn("__next", F.lead("__s").over(w)).filter(
        F.col("__next").isNotNull()
    )
    return pairs.groupBy(
        F.col("__s").alias("from_step"), F.col("__next").alias("to_step")
    ).agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.countDistinct(user_col).alias("n_users"),
    )


def cumulative_users(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    width_seconds: int,
) -> DataFrame:
    """Users-to-date curve: per period, the count of NEW users (first
    event in that period) and the running cumulative distinct-user
    count — the growth dashboard a naive ``COUNT(DISTINCT)`` per
    period cannot produce without rescanning history per period.

    ONE shuffle on the user key (min period per user), then all window
    work happens on the PERIOD-sized table (horizon/width rows):
    periods with no new users still appear (carried by the same
    sequence-grid trick as ``fill_gaps``) so the curve has no holes.
    Returns ``(period_s epoch-seconds, new_users, cum_users)``.
    """
    if width_seconds < 1:
        raise ValueError("width_seconds must be >= 1")
    w = int(width_seconds)
    firsts = (
        df.select(
            F.col(user_col),
            F.floor(F.unix_timestamp(F.col(ts_col)) / w)
            .cast("long")
            .alias("__p"),
        )
        .filter(F.col("__p").isNotNull() & F.col(user_col).isNotNull())
        .groupBy(user_col)
        .agg(F.min("__p").alias("__first"))
        .groupBy("__first")
        .agg(F.count("*").alias("new_users"))
    )
    # period-sized (horizon/width rows) and it feeds BOTH the span
    # aggregate and the grid join — checkpoint so the raw event table
    # is scanned once, not once per branch
    firsts = firsts.localCheckpoint(eager=True)
    span = firsts.agg(
        F.min("__first").alias("__lo"), F.max("__first").alias("__hi")
    )
    grid = span.select(
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("__first")
    )
    from pyspark.sql import Window

    cum = Window.orderBy("__first").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        grid.join(firsts, "__first", "left")
        .withColumn("new_users", F.coalesce("new_users", F.lit(0)))
        .withColumn("cum_users", F.sum("new_users").over(cum))
        .select(
            (F.col("__first") * w).alias("period_s"),
            "new_users",
            "cum_users",
        )
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    width_seconds: int,
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the period of
    their FIRST event (``floor(epoch/width)``); for every (cohort,
    period offset) the count of cohort members active in that period.
    Returns ``(cohort_s epoch-seconds, offset long >= 0, users)``.

    ONE shuffle on the user key: per user, min period + the distinct
    period set come from the same groupBy (``collect_set`` is bounded
    by horizon/width periods per user, not by event count); the
    explode that follows emits at most that many rows per user, and
    the final groupBy needs no count-distinct — per-user periods are
    already unique.  The raw event table is never shuffled on
    anything but the user key and never scanned twice.
    """
    if width_seconds < 1:
        raise ValueError("width_seconds must be >= 1")
    w = int(width_seconds)
    per_user = (
        df.select(
            F.col(user_col),
            F.floor(F.unix_timestamp(F.col(ts_col)) / w).cast("long").alias("__p"),
        )
        .filter(F.col("__p").isNotNull() & F.col(user_col).isNotNull())
        .groupBy(user_col)
        .agg(F.min("__p").alias("__cohort"), F.collect_set("__p").alias("__ps"))
    )
    return (
        per_user.select("__cohort", F.explode("__ps").alias("__p"))
        .groupBy(
            (F.col("__cohort") * w).alias("cohort_s"),
            (F.col("__p") - F.col("__cohort")).alias("offset"),
        )
        .agg(F.count("*").alias("users"))
    )


def trimmed_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    trim_frac: float = 0.1,
) -> DataFrame:
    """Per-group robust location estimates: the ``trim_frac``-trimmed
    mean (drop the ``floor(n * frac)`` smallest and largest values)
    and the winsorized mean (CLAMP them to the surviving extremes
    instead) — the outlier-robust pair a metrics pipeline reads when
    raw means are poisoned by telemetry spikes.

    Exactness contract (the cross-engine float trap): values are
    snapped to 2^20 integer micro-units up front, every sum runs in
    long arithmetic (order-independent, so Spark's partition-order
    summation and any oracle's sorted summation agree bit-for-bit),
    and each mean is ONE double division at the end.  Trim ranks come
    from ``row_number`` over the snapped value — ties are
    interchangeable in micro-unit space, so the kept-set SUM is
    deterministic even though the kept set itself is not.

    One shuffle to the group windows, one aggregate.  Returns
    ``(group, n, n_trimmed, trimmed_mean, winsor_mean)`` (9 dp);
    groups where trimming would drop everything (n <= 2t) fall back
    to the untrimmed mean.
    """
    if not (0.0 <= trim_frac < 0.5):
        raise ValueError(f"trim_frac must be in [0, 0.5), got {trim_frac}")
    from pyspark.sql import Window

    SCALE = 1 << 20
    # non-finite guard: Spark casts NaN->0 / Inf->max-long silently
    # while DuckDB ERRORS on the same cast — drop NaN/Inf rows before
    # snapping so both engines (and the stats themselves) see the same
    # population
    vraw = F.col(value_col).cast("double")
    base = (
        df.filter(
            vraw.isNotNull()
            & ~F.isnan(vraw)
            & (F.abs(vraw) < F.lit(float("inf")))
        )
        .select(
            F.col(group_col).alias("group"),
            F.round(vraw * SCALE).cast("long").alias("v"),
        )
    )
    w = Window.partitionBy("group").orderBy("v")
    wg = Window.partitionBy("group")
    ranked = base.select(
        "group",
        "v",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wg).alias("n"),
    ).withColumn(
        "t",
        F.when(
            F.col("n") > 2 * F.floor(F.col("n") * trim_frac),
            F.floor(F.col("n") * trim_frac),
        )
        .otherwise(F.lit(0))
        .cast("long"),
    )
    kept = F.col("rk") > F.col("t")
    kept = kept & (F.col("rk") <= F.col("n") - F.col("t"))
    agg = ranked.groupBy("group").agg(
        F.max("n").alias("n"),
        (F.lit(2) * F.max("t")).alias("n_trimmed"),
        # decimal(38,0) accumulation: a group's micro-unit sum passes
        # int64 at ~1e9 rows x 1e6-scale values (DuckDB's sum(BIGINT)
        # widens to HUGEINT; this is the Spark twin)
        F.sum(F.when(kept, F.col("v")).cast("decimal(38,0)")).alias(
            "s_kept"
        ),
        F.count(F.when(kept, F.lit(1))).alias("n_kept"),
        # winsorization clamps: the smallest and largest SURVIVING
        # values, each weighted by the t rows clamped onto them
        F.max(F.when(F.col("rk") == F.col("t") + 1, F.col("v"))).alias(
            "lo"
        ),
        F.max(
            F.when(F.col("rk") == F.col("n") - F.col("t"), F.col("v"))
        ).alias("hi"),
        F.max("t").alias("tt"),
    )
    return agg.select(
        "group",
        F.col("n").cast("long").alias("n"),
        F.col("n_trimmed").cast("long").alias("n_trimmed"),
        F.round(
            F.col("s_kept").cast("double")
            / (F.col("n_kept") * SCALE).cast("double"),
            9,
        ).alias("trimmed_mean"),
        F.round(
            (
                F.col("s_kept")
                + (F.col("tt") * F.col("lo")).cast("decimal(38,0)")
                + (F.col("tt") * F.col("hi")).cast("decimal(38,0)")
            ).cast("double")
            / (F.col("n") * SCALE).cast("double"),
            9,
        ).alias("winsor_mean"),
    )
