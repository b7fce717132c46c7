"""Event-sequence analytics: funnel conversion and cohort retention — the
two standard event-table rollups a time-series engine serves beside its
windowed aggregates (SURVEY.md §2.8 extension surface; both pure grouped
aggregation + broadcast-scale joins, fully oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.registry import register
from ..session import SHUFFLE_PARTITIONS


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "funnel_three_stage",
    oracle="""
    WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'click' GROUP BY user_id
    ), s2 AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ), s3 AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
        WHERE e.event_type = 'error' GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_click,
           CAST((SELECT count(*) FROM s2) AS BIGINT) AS n_click_purchase,
           CAST((SELECT count(*) FROM s3) AS BIGINT) AS n_click_purchase_error
    """,
    tags=("events", "funnel"),
)
def q_funnel_three_stage(spark, sf_dir):
    """Ordered three-stage funnel (click → purchase → error): each stage is
    the per-user min event time strictly after the previous stage's; the
    funnel counts users surviving each stage. Per stage: one grouped min +
    one join on user_id — every relation after stage 1 is |users|-sized.
    No broadcast hints: |users| is unbounded (tens of millions at 100 TB,
    a driver/executor OOM if forced onto the build side), and the stage
    joins key on the same user_id the grouped mins already hash-partition
    on, so a shuffle join co-partitions for free; AQE still downgrades to
    broadcast at runtime when a stage relation measures small."""
    ev = _t(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "error")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count("*").alias("n_click"))
        .crossJoin(s2.agg(F.count("*").alias("n_click_purchase")))
        .crossJoin(s3.agg(F.count("*").alias("n_click_purchase_error")))
    )


@register(
    "retention_cohorts",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               CAST(date_diff('week', f.cohort_week, date_trunc('week', e.ts)) AS BIGINT)
                   AS week_offset
        FROM events e JOIN first_seen f ON e.user_id = f.user_id
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week, week_offset,
           CAST(count(*) AS BIGINT) AS active_users
    FROM activity
    GROUP BY cohort_week, week_offset
    """,
    tags=("events", "retention", "cohort"),
)
def q_retention_cohorts(spark, sf_dir):
    """Cohort retention triangle: users bucketed by first-seen week, counted
    once per (cohort, week-offset) they were active in. First-seen is one
    grouped min; the cohort map is |users|-sized — unbounded, so no forced
    broadcast (AQE may still pick one when it measures small); the distinct
    collapses per-user-week activity before the final count."""
    ev = _t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week")) / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"), "week_offset"
    ).agg(F.count("*").alias("active_users"))


@register(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS cur,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events
    ), pairs AS (
        SELECT cur, nxt, count(*) AS n FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    )
    SELECT cur, nxt, CAST(n AS BIGINT) AS n_transitions,
           round(n / (sum(n) OVER (PARTITION BY cur)), 6) AS p_next
    FROM pairs
    """,
    tags=("events", "sequence", "markov"),
)
def q_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event sequences:
    P(next event type | current). The per-user ordering window and the pair
    count agg are the only shuffles; the probability normalization windows
    over the |types|² transition relation (tiny at any corpus size). The
    empirical transition model behind next-event prediction and
    funnel-dropoff attribution."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"), F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    pairs = seq.groupBy("cur", "nxt").agg(F.count("*").alias("n"))
    wt = Window.partitionBy("cur")
    return pairs.select(
        "cur",
        "nxt",
        F.col("n").cast("long").alias("n_transitions"),
        F.round(F.col("n") / F.sum("n").over(wt), 6).alias("p_next"),
    )


@register(
    "events_type_cooccurrence",
    oracle="""
    WITH per_user AS (
        SELECT user_id, list_sort(list_distinct(list(event_type))) AS types
        FROM events GROUP BY user_id
    ), pairs AS (
        SELECT unnest(flatten(list_transform(range(1, len(types) + 1),
                   i -> list_transform(range(i + 1, len(types) + 1),
                        j -> {'a': types[i], 'b': types[j]})))) AS p
        FROM per_user
    )
    SELECT p.a AS type_a, p.b AS type_b, CAST(count(*) AS BIGINT) AS n_users
    FROM pairs GROUP BY p.a, p.b
    """,
    tags=("events", "cooccurrence"),
)
def q_type_cooccurrence(spark, sf_dir):
    """Event-type co-occurrence: for each unordered type pair, how many
    users exhibit both. The per-user type set is bounded by |event types|
    (collect_set stays O(types) per user, never O(events)), and pair
    generation is array-native over that tiny set — the market-basket
    co-occurrence shape without a self-join."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("types")
    )
    pairs = per_user.select(
        F.explode(
            F.expr(
                "flatten(transform(types, (a, i) ->"
                " transform(slice(types, i + 2, size(types)), b -> struct(a, b))))"
            )
        ).alias("p")
    )
    return pairs.groupBy(
        F.col("p.a").alias("type_a"), F.col("p.b").alias("type_b")
    ).agg(F.count("*").cast("long").alias("n_users"))


@register(
    "events_top_paths",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS e1,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), paths AS (
        SELECT e1 || '>' || e2 || '>' || e3 AS path, count(*) AS n
        FROM seq WHERE e3 IS NOT NULL
        GROUP BY e1 || '>' || e2 || '>' || e3
    )
    SELECT path, CAST(n AS BIGINT) AS n_occurrences,
           CAST(row_number() OVER (ORDER BY n DESC, path) AS BIGINT) AS rank
    FROM paths
    QUALIFY rank <= 20
    """,
    tags=("events", "sequence", "paths"),
)
def q_events_top_paths(spark, sf_dir):
    """Top-20 length-3 event-type paths across all users (the Sankey /
    user-journey mining primitive): two leads over the per-user ordering
    window build every consecutive triple, one grouped count ranks them.
    The path relation is at most |types|³ rows (125 here) regardless of
    corpus size, so the global ranking is a TakeOrdered over a tiny
    aggregate — the per-user window is the only data-sized shuffle."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    paths = seq.groupBy(
        F.concat_ws(">", "e1", "e2", "e3").alias("path")
    ).agg(F.count("*").alias("n"))
    wr = Window.orderBy(F.desc("n"), F.asc("path"))
    return (
        paths.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= 20)
        .select("path", F.col("n").cast("long").alias("n_occurrences"), "rank")
    )


@register(
    "funnel_conversion_lag",
    oracle="""
    WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'click' GROUP BY user_id
    ), s2 AS (
        SELECT e.user_id,
               min(epoch_us(date_trunc('microseconds', e.ts))
                   - epoch_us(date_trunc('microseconds', s1.t1))) AS gap_us
        FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ), grid AS (
        SELECT CAST(floor(gap_us / 1000000.0) AS BIGINT) AS gap_s,
               CAST(count(*) AS BIGINT) AS c,
               CAST(sum(gap_us) AS BIGINT) AS su
        FROM s2 GROUP BY 1
    ), cum AS (
        SELECT gap_s, c,
               CAST(sum(c) OVER (ORDER BY gap_s) AS BIGINT) AS cm
        FROM grid
    ), tot AS (
        SELECT CAST(sum(c) AS BIGINT) AS n, CAST(sum(su) AS BIGINT) AS sumu FROM grid
    )
    SELECT t.n AS n_converted,
           floor(CAST(t.sumu AS DOUBLE) / (1000000.0 * t.n) * 1000000 + 0.5)
             / 1000000 AS mean_lag_s,
           CAST(min(CASE WHEN cm >= CAST(ceil(0.5 * t.n) AS BIGINT)
                         THEN gap_s END) AS BIGINT) AS p50_lag_s,
           CAST(min(CASE WHEN cm >= CAST(ceil(0.9 * t.n) AS BIGINT)
                         THEN gap_s END) AS BIGINT) AS p90_lag_s,
           CAST(max(gap_s) AS BIGINT) AS max_lag_s
    FROM cum CROSS JOIN tot t
    GROUP BY t.n, t.sumu
    """,
    tags=("events", "funnel", "latency"),
)
def q_funnel_conversion_lag(spark, sf_dir):
    """Click→purchase conversion-lag distribution: per converting user the
    first post-click purchase lag, then exact nearest-rank p50/p90/max and
    exact mean over all converters. The percentile trick is the KS/grid
    one: lags are bucketed to integer SECONDS and the cumulative count runs
    over the (distinct lag-second, count) grid via the range-partitioned
    `grid_cumsum` (stats.py) — never a single-partition sort of anything
    unbounded (the per-user relation is millions of rows at 100 TB; even
    the grid cumsum is bucket-parallel). Everything is BIGINT microseconds
    until the one floor-canonicalized mean division."""
    from .stats import grid_cumsum

    ev = _t(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(
            F.min(F.unix_micros("ts") - F.unix_micros("t1")).alias("gap_us")
        )
    )
    grid = s2.groupBy(
        F.floor(F.col("gap_us") / F.lit(1000000.0)).cast("long").alias("gap_s")
    ).agg(
        F.count("*").cast("long").alias("c"),
        F.sum("gap_us").cast("long").alias("su"),
    )
    cum = grid_cumsum(grid, ["c"], order_col="gap_s").select(
        "gap_s", "c", F.col("cum_c").alias("cm")
    )
    tot = grid.agg(
        F.sum("c").cast("long").alias("n"), F.sum("su").cast("long").alias("sumu")
    )
    j = cum.crossJoin(F.broadcast(tot))
    return (
        j.groupBy("n", "sumu")
        .agg(
            F.min(
                F.when(F.col("cm") >= F.ceil(0.5 * F.col("n")), F.col("gap_s"))
            ).cast("long").alias("p50_lag_s"),
            F.min(
                F.when(F.col("cm") >= F.ceil(0.9 * F.col("n")), F.col("gap_s"))
            ).cast("long").alias("p90_lag_s"),
            F.max("gap_s").cast("long").alias("max_lag_s"),
            (F.floor(
                F.col("sumu").cast("double") / (F.lit(1000000.0) * F.col("n"))
                * 1000000 + 0.5
            ) / 1000000).alias("mean_lag_s"),
        )
        .select(
            F.col("n").alias("n_converted"), "mean_lag_s",
            "p50_lag_s", "p90_lag_s", "max_lag_s",
        )
    )


@register(
    "events_markov_stationary",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS cur,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events
    ), pairs AS (
        SELECT cur, nxt, count(*) AS n FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ), p AS (
        SELECT cur, nxt, n / (sum(n) OVER (PARTITION BY cur)) AS p
        FROM pairs
    ), states AS (
        SELECT DISTINCT cur AS state FROM p
    ), k AS (SELECT CAST(count(*) AS DOUBLE) AS kk FROM states),
    pi0 AS (
        SELECT state, 1.0 / (SELECT kk FROM k) AS pi FROM states
    ), pi1 AS (
        SELECT p.nxt AS state, sum(pi0.pi * p.p) AS pi
        FROM p JOIN pi0 ON pi0.state = p.cur GROUP BY p.nxt
    ), pi2 AS (
        SELECT p.nxt AS state, sum(pi1.pi * p.p) AS pi
        FROM p JOIN pi1 ON pi1.state = p.cur GROUP BY p.nxt
    ), pi3 AS (
        SELECT p.nxt AS state, sum(pi2.pi * p.p) AS pi
        FROM p JOIN pi2 ON pi2.state = p.cur GROUP BY p.nxt
    )
    SELECT state, round(pi, 9) AS pi FROM pi3
    """,
    tags=("events", "markov", "iterative"),
)
def q_markov_stationary(spark, sf_dir):
    """Three-step state distribution of the empirical event-type Markov
    chain from a uniform start — the behavioral-equilibrium companion to
    `events_markov_transitions` (where does user attention settle), built
    exactly like PageRank: the |types|² probability matrix is the model
    table, each iteration is one broadcast join + grouped sum (relational
    matvec over a 25-row relation — the raw events are scanned ONCE for
    the transition counts and never again). Fixed iterations + exact
    count-ratio probabilities -> full round-9 value oracle."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"), F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    pairs = seq.groupBy("cur", "nxt").agg(F.count("*").alias("n"))
    wt = Window.partitionBy("cur")
    p = pairs.select(
        "cur", "nxt", (F.col("n") / F.sum("n").over(wt)).alias("p")
    ).localCheckpoint(eager=False)
    states = p.select(F.col("cur").alias("state")).distinct()
    k = states.agg(F.count("*").cast("double").alias("kk"))
    pi = states.crossJoin(F.broadcast(k)).select(
        "state", (F.lit(1.0) / F.col("kk")).alias("pi")
    )
    for _ in range(3):
        pi = (
            p.join(F.broadcast(pi.withColumnRenamed("state", "cur")), "cur")
            .groupBy(F.col("nxt").alias("state"))
            .agg(F.sum(F.col("pi") * F.col("p")).alias("pi"))
        )
    return pi.select("state", F.round("pi", 9).alias("pi"))


# ---------------------------------------------------------------------------
# Kaplan-Meier survival — user-lifetime retention with right censoring
# ---------------------------------------------------------------------------


@register(
    "events_kaplan_meier",
    oracle="""
    WITH life AS (
        SELECT user_id,
               CAST(date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE)))
                    AS BIGINT) AS t,
               (max(CAST(ts AS DATE))
                < (SELECT max(CAST(ts AS DATE)) FROM events)) AS died
        FROM events GROUP BY user_id
    ), ev AS (
        SELECT t,
               CAST(count(*) FILTER (WHERE died) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS leaving
        FROM life GROUP BY t
    ), risk AS (
        SELECT t, d, leaving,
               CAST(sum(leaving) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk
        FROM ev
    ), surv AS (
        SELECT t, d, n_risk,
               exp(sum(ln(1.0 - d / CAST(n_risk AS DOUBLE)))
                   OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)) AS s
        FROM risk WHERE d > 0
    )
    SELECT t AS day, d AS n_deaths, n_risk,
           floor(s * 1000000 + 0.5) / 1000000 AS survival
    FROM surv
    """,
    tags=("events", "survival", "retention"),
)
def q_events_kaplan_meier(spark, sf_dir):
    """Kaplan-Meier survival curve of user LIFETIME (days between a
    user's first and last observed event), right-censored at the corpus
    end date (users still active on the final day are censored, not
    deaths) — the churn/retention curve done correctly, where the naive
    "fraction still active after t days" silently treats censored users
    as churned.

    Scale shape: everything reduces to the per-user lifetime relation
    (one grouped agg) and then to the distinct-lifetime-day grid; n_risk
    is a reverse cumulative sum over that bounded grid and the survival
    product is exp of a cumulative sum of logs — both engine-portable
    because each step's input (d/n_risk) is an exact integer ratio; the
    floor canonicalization absorbs the libm ulp. The global windows run
    over the ≤|distinct lifetimes| grid (bounded by the time range),
    never over users."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    gmax = ev.agg(F.max(F.col("ts").cast("date")).alias("gd"))
    life = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.col("ts").cast("date")).alias("d0"),
            F.max(F.col("ts").cast("date")).alias("d1"),
        )
        .crossJoin(F.broadcast(gmax))
        .select(
            F.datediff("d1", "d0").cast("long").alias("t"),
            (F.col("d1") < F.col("gd")).alias("died"),
        )
    )
    grid = life.groupBy("t").agg(
        F.sum(F.when(F.col("died"), 1).otherwise(0)).cast("long").alias("d"),
        F.count("*").cast("long").alias("leaving"),
    )
    w_rev = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = grid.select(
        "t", "d", F.sum("leaving").over(w_rev).cast("long").alias("n_risk")
    )
    w_fwd = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    surv = risk.filter(F.col("d") > 0).select(
        "t",
        "d",
        "n_risk",
        F.exp(
            F.sum(F.log(F.lit(1.0) - F.col("d") / F.col("n_risk").cast("double"))).over(
                w_fwd
            )
        ).alias("s"),
    )
    return surv.select(
        F.col("t").alias("day"),
        F.col("d").alias("n_deaths"),
        "n_risk",
        (F.floor(F.col("s") * 1000000 + F.lit(0.5)) / 1000000).alias("survival"),
    )


# ---------------------------------------------------------------------------
# Markov session likelihood — behavioral anomaly scoring (r5)
# ---------------------------------------------------------------------------


@register(
    "events_session_likelihood",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS cur,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events
    ), pairs AS (
        SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n
        FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ), model AS (
        SELECT cur, nxt, round(n / (sum(n) OVER (PARTITION BY cur)), 9) AS p
        FROM pairs
    ), walk AS (
        SELECT s.user_id, ln(m.p) AS lp
        FROM seq s JOIN model m ON m.cur = s.cur AND m.nxt = s.nxt
        WHERE s.nxt IS NOT NULL
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_steps,
           floor(sum(lp) * 1000000 + 0.5) / 1000000 AS log_likelihood,
           floor(exp(-avg(lp)) * 1000000 + 0.5) / 1000000 AS perplexity
    FROM walk GROUP BY user_id
    """,
    tags=("events", "sequence", "markov", "anomaly"),
)
def q_events_session_likelihood(spark, sf_dir):
    """Per-user behavioral likelihood under the corpus-wide first-order
    Markov model: fit P(next|cur) from ALL transitions (the
    `events_markov_transitions` model), then score every user's own
    event walk — low likelihood / high perplexity = behavior the
    population model does not explain (bots, broken clients, fraud).
    The sequence-model twin of `corpus_lm_perplexity`.

    The |types|² model relation broadcasts onto the transition stream, so
    scoring is one window pass + one broadcast join + one grouped sum at
    any scale; probabilities are round-9 pinned before ln on both
    engines, and every transition that occurs has model mass by
    construction (the model was fit on the same stream — no zero-prob
    guard needed in-sample)."""
    from pyspark.sql import Window  # noqa: PLC0415

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    seq = seq.localCheckpoint(eager=False)
    pairs = seq.groupBy("cur", "nxt").agg(F.count("*").cast("long").alias("n"))
    wc = Window.partitionBy("cur")
    model = pairs.select(
        "cur", "nxt", F.round(F.col("n") / F.sum("n").over(wc), 9).alias("p")
    )
    walk = seq.join(F.broadcast(model), ["cur", "nxt"]).select(
        "user_id", F.log("p").alias("lp")
    )
    canon = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return walk.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_steps"),
        canon(F.sum("lp")).alias("log_likelihood"),
        canon(F.exp(-F.avg("lp"))).alias("perplexity"),
    )


@register(
    "events_dau_wau_stickiness",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), days AS (SELECT DISTINCT d FROM ud),
    dau AS (
        SELECT d, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY d
    ), wau AS (
        SELECT g.d, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
        FROM days g JOIN ud u ON u.d BETWEEN g.d - 6 AND g.d
        GROUP BY g.d
    )
    SELECT strftime(dau.d, '%Y-%m-%d') AS day, dau.dau, wau.wau,
           round(dau.dau / CAST(wau.wau AS DOUBLE), 6) AS stickiness
    FROM dau JOIN wau ON wau.d = dau.d
    """,
    tags=("events", "engagement", "rangejoin"),
)
def q_events_dau_wau_stickiness(spark, sf_dir):
    """DAU / trailing-7-day WAU / stickiness per day — the engagement
    triple every product-analytics pipeline serves. The trailing-window
    distinct count is a bounded RANGE JOIN of the day spine against the
    deduplicated (user, day) relation (days x active-users volume — the
    user-day grid, never raw ticks); at 100 TB the spine join partitions
    by day block exactly like `range_join_purchase_errors`. Integer
    counts; one rounded ratio."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    ud = ud.localCheckpoint(eager=False)
    days = ud.select("d").distinct()
    dau = ud.groupBy("d").agg(F.count("*").cast("long").alias("dau"))
    g = days.select(F.col("d").alias("day"))
    wau = (
        g.join(
            ud,
            (F.col("d") >= F.date_sub(F.col("day"), 6)) & (F.col("d") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("long").alias("wau"))
    )
    return (
        dau.withColumnRenamed("d", "day")
        .join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau", "wau",
            F.round(F.col("dau") / F.col("wau").cast("double"), 6).alias("stickiness"),
        )
    )


@register(
    "events_cohort_ltv",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ), sizes AS (
        SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_users
        FROM first_seen GROUP BY cohort_week
    ), rev AS (
        SELECT f.cohort_week,
               CAST(date_diff('week', f.cohort_week, date_trunc('week', e.ts)) AS BIGINT)
                   AS week_offset,
               CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        FROM events e JOIN first_seen f ON e.user_id = f.user_id
        WHERE e.event_type = 'purchase'
        GROUP BY f.cohort_week, 2
    ), cum AS (
        SELECT cohort_week, week_offset, rev_cents,
               CAST(sum(rev_cents) OVER (PARTITION BY cohort_week ORDER BY week_offset
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_rev_cents
        FROM rev
    )
    SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week, c.week_offset,
           s.cohort_users, c.rev_cents, c.cum_rev_cents,
           round(c.cum_rev_cents / (100.0 * s.cohort_users), 6) AS ltv_per_user
    FROM cum c JOIN sizes s ON s.cohort_week = c.cohort_week
    """,
    tags=("events", "cohort", "ltv", "revenue"),
)
def q_events_cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value curve: cumulative purchase revenue per
    first-seen-week cohort by week offset, normalized per cohort user —
    the LTV companion to `retention_cohorts` (retention counts who comes
    back; LTV sums what they spend). Revenue accumulates as exact integer
    cents; the running sum windows over the bounded cohort x offset grid
    (weeks², never ticks); cohort sizes join from the one grouped-min
    first-seen relation."""
    from pyspark.sql import Window  # noqa: PLC0415

    ev = _t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    sizes = first_seen.groupBy("cohort_week").agg(
        F.count("*").cast("long").alias("cohort_users")
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week")) / 7
            ).cast("long").alias("week_offset"),
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("rev_cents"))
    )
    wc = (
        Window.partitionBy("cohort_week").orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = rev.withColumn(
        "cum_rev_cents", F.sum("rev_cents").over(wc).cast("long")
    )
    return cum.join(sizes, "cohort_week").select(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset", "cohort_users", "rev_cents", "cum_rev_cents",
        F.round(
            F.col("cum_rev_cents") / (F.lit(100.0) * F.col("cohort_users")), 6
        ).alias("ltv_per_user"),
    )


# ---------------------------------------------------------------------------
# Markov removal-effect attribution (r5)
# ---------------------------------------------------------------------------


def _attribution_oracle() -> str:
    square = lambda src, dst: f"""
    {dst} AS (
        SELECT a.scenario, a.i, b.j, sum(a.p * b.p) AS p
        FROM {src} a JOIN {src} b
          ON b.scenario = a.scenario AND b.i = a.j
        GROUP BY a.scenario, a.i, b.j
    )"""  # noqa: E731
    return f"""
    WITH seq AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'purchase' THEN 'CONV'
                    ELSE event_type END AS st,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ), firstconv AS (
        SELECT user_id, min(rn) AS crn FROM seq WHERE st = 'CONV' GROUP BY user_id
    ), kept AS (
        SELECT s.user_id, s.st, s.rn,
               max(s.rn) OVER (PARTITION BY s.user_id) AS lastrn
        FROM seq s LEFT JOIN firstconv f ON f.user_id = s.user_id
        WHERE f.crn IS NULL OR s.rn <= f.crn
    ), moves AS (
        SELECT user_id, st AS cur,
               lead(st) OVER (PARTITION BY user_id ORDER BY rn) AS nxt,
               rn, lastrn
        FROM kept
    ), raw AS (
        SELECT cur, nxt FROM moves WHERE nxt IS NOT NULL
        UNION ALL
        SELECT 'START' AS cur, st AS nxt FROM kept WHERE rn = 1
        UNION ALL
        SELECT cur, 'NULL' AS nxt FROM moves
        WHERE rn = lastrn AND cur <> 'CONV'
    ), counts AS (
        SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n FROM raw GROUP BY cur, nxt
    ), probs AS (
        SELECT cur, nxt, round(n / (sum(n) OVER (PARTITION BY cur)), 9) AS p
        FROM counts
    ), scen AS (
        SELECT unnest(['baseline', 'click', 'error', 'signup', 'view']) AS scenario
    ), t0 AS MATERIALIZED (
        SELECT s.scenario, p.cur AS i,
               CASE WHEN p.nxt = s.scenario THEN 'NULL' ELSE p.nxt END AS j,
               sum(p.p) AS p
        FROM probs p CROSS JOIN scen s
        WHERE p.cur <> s.scenario
        GROUP BY s.scenario, p.cur, 3
        UNION ALL
        SELECT s.scenario, a.s AS i, a.s AS j, 1.0 AS p
        FROM (SELECT unnest(['CONV', 'NULL']) AS s) a CROSS JOIN scen s
    ),{square("t0", "t2")},{square("t2", "t4")},{square("t4", "t8")},{square("t8", "t16")},
    conv AS (
        -- a scenario whose removal kills EVERY conversion has no
        -- (START, CONV) mass row at all: left-join the scenario list and
        -- coalesce to 0 so the channel still reports (with effect 1)
        SELECT s.scenario, coalesce(c.pc, 0.0) AS pc
        FROM scen s LEFT JOIN (
            SELECT scenario, sum(p) AS pc FROM t16
            WHERE i = 'START' AND j = 'CONV' GROUP BY scenario
        ) c ON c.scenario = s.scenario
    ), base AS (SELECT pc AS pb FROM conv WHERE scenario = 'baseline'),
    eff AS (
        SELECT c.scenario AS channel,
               floor(c.pc * 1000000 + 0.5) / 1000000 AS p_conv_without,
               floor((1.0 - c.pc / b.pb) * 1000000 + 0.5) / 1000000
                   AS removal_effect,
               (1.0 - c.pc / b.pb) AS re_raw
        FROM conv c CROSS JOIN base b WHERE c.scenario <> 'baseline'
    )
    SELECT channel, p_conv_without, removal_effect,
           CASE WHEN sum(re_raw) OVER () > 0 THEN
               floor(re_raw / (sum(re_raw) OVER ()) * 1000000 + 0.5) / 1000000
           END AS attribution_share
    FROM eff
    """


@register(
    "events_markov_attribution",
    oracle=_attribution_oracle(),
    tags=("events", "markov", "attribution", "iterative"),
)
def q_events_markov_attribution(spark, sf_dir):
    """Markov removal-effect attribution: which pre-purchase channel
    actually DRIVES conversions? Build the first-order journey chain
    (START → events → CONV at first purchase / NULL at drop-off), then
    for each channel re-run the chain with that channel's inbound edges
    redirected to NULL and measure how much conversion probability
    disappears — the data-driven alternative to last-touch attribution.

    Absorption probabilities come from FOUR matrix squarings (T→T¹⁶ with
    CONV/NULL absorbing), not a solver: each squaring is one self-join +
    grouped sum on the (scenario, i, j) relation — ~6 scenarios × |states|²
    rows TOTAL, with all scenarios advancing in the same join (scenario is
    just a key). The journey scan is the only pass over the data; the
    chain algebra never touches it. Probabilities round-9 before the
    power; absorbed mass canon 1e-6."""
    from pyspark.sql import Window  # noqa: PLC0415

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "ts", "event_id",
        F.when(F.col("event_type") == "purchase", "CONV")
        .otherwise(F.col("event_type")).alias("st"),
        F.row_number().over(w).alias("rn"),
    )
    firstconv = seq.filter(F.col("st") == "CONV").groupBy("user_id").agg(
        F.min("rn").alias("crn")
    )
    kept = (
        seq.join(firstconv, "user_id", "left")
        .filter(F.col("crn").isNull() | (F.col("rn") <= F.col("crn")))
        .select(
            "user_id", "st", "rn",
            F.max("rn").over(Window.partitionBy("user_id")).alias("lastrn"),
        )
    )
    # pin a sane partition layout before freezing: the checkpointed RDD's
    # raw partitioning (pre-AQE) otherwise leaks into the 3-branch union
    # below as a 1000-task stage
    kept = kept.repartition(SHUFFLE_PARTITIONS, "user_id").localCheckpoint(eager=False)
    wk = Window.partitionBy("user_id").orderBy("rn")
    moves = kept.select(
        "user_id", F.col("st").alias("cur"),
        F.lead("st").over(wk).alias("nxt"), "rn", "lastrn",
    )
    raw = (
        moves.filter(F.col("nxt").isNotNull()).select("cur", "nxt")
        .union(
            kept.filter(F.col("rn") == 1).select(
                F.lit("START").alias("cur"), F.col("st").alias("nxt")
            )
        )
        .union(
            moves.filter(
                (F.col("rn") == F.col("lastrn")) & (F.col("cur") != "CONV")
            ).select("cur", F.lit("NULL").alias("nxt"))
        )
    )
    counts = raw.groupBy("cur", "nxt").agg(F.count("*").cast("long").alias("n"))
    probs = counts.select(
        "cur", "nxt",
        F.round(F.col("n") / F.sum("n").over(Window.partitionBy("cur")), 9).alias("p"),
    )
    scen = spark.createDataFrame(
        [("baseline",), ("click",), ("error",), ("signup",), ("view",)],
        "scenario string",
    )
    t = (
        probs.crossJoin(F.broadcast(scen))
        .filter(F.col("cur") != F.col("scenario"))
        .groupBy(
            "scenario",
            F.col("cur").alias("i"),
            F.when(F.col("nxt") == F.col("scenario"), "NULL")
            .otherwise(F.col("nxt")).alias("j"),
        )
        .agg(F.sum("p").alias("p"))
        .union(
            # one literal frame, NOT createDataFrame(2 rows) crossJoined
            # with the 5-row scenario frame: that unbroadcast 2x5
            # cartesian inherits 32x32 = 1024 RDD partitions and, once
            # unioned and checkpointed, drags a 1025-task stage through
            # every downstream job (measured: ~12 s of pure task overhead
            # to carry 10 rows)
            spark.createDataFrame(
                [(sc, st, st, 1.0)
                 for sc in ("baseline", "click", "error", "signup", "view")
                 for st in ("CONV", "NULL")],
                "scenario string, i string, j string, p double",
            )
        )
        # the chain relation is ~scenarios x |states|^2 rows forever:
        # repartition(1) (a real shuffle boundary — coalesce(1) would
        # collapse the whole upstream journey scan into one task through
        # the narrow union) before freezing it
        .repartition(1)
        .localCheckpoint(eager=True)
    )
    for _ in range(4):  # T -> T^16
        a = t.select("scenario", "i", F.col("j").alias("m"), F.col("p").alias("pa"))
        b = t.select("scenario", F.col("i").alias("m"), "j", F.col("p").alias("pb"))
        t = (
            a.join(b, ["scenario", "m"])
            .groupBy("scenario", "i", "j")
            .agg(F.sum(F.col("pa") * F.col("pb")).alias("p"))
            .repartition(1)
            .localCheckpoint(eager=True)
        )
    conv_raw = (
        t.filter((F.col("i") == "START") & (F.col("j") == "CONV"))
        .groupBy("scenario")
        .agg(F.sum("p").alias("pc"))
    )
    # a scenario whose removal kills EVERY conversion has no mass row:
    # left-join the scenario list, coalesce to 0 (effect = 1)
    conv = scen.join(conv_raw, "scenario", "left").select(
        "scenario", F.coalesce(F.col("pc"), F.lit(0.0)).alias("pc")
    )
    base = conv.filter(F.col("scenario") == "baseline").select(
        F.col("pc").alias("pb")
    )
    canon = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    eff = (
        conv.filter(F.col("scenario") != "baseline")
        .crossJoin(F.broadcast(base))
        .select(
            F.col("scenario").alias("channel"),
            canon(F.col("pc")).alias("p_conv_without"),
            canon(F.lit(1.0) - F.col("pc") / F.col("pb")).alias("removal_effect"),
            (F.lit(1.0) - F.col("pc") / F.col("pb")).alias("re_raw"),
        )
    )
    tot_re = F.sum("re_raw").over(Window.partitionBy())
    return eff.select(
        "channel", "p_conv_without", "removal_effect",
        F.when(tot_re > 0, canon(F.col("re_raw") / tot_re)).alias(
            "attribution_share"
        ),
    )


# ---------------------------------------------------------------------------
# Log-rank test — two-arm survival comparison over the lifetime grid
# ---------------------------------------------------------------------------


@register(
    "events_logrank_test",
    oracle="""
    WITH life AS (
        SELECT user_id, CAST(user_id % 2 AS BIGINT) AS arm,
               CAST(date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE)))
                    AS BIGINT) AS t,
               (max(CAST(ts AS DATE))
                < (SELECT max(CAST(ts AS DATE)) FROM events)) AS died
        FROM events GROUP BY user_id
    ), ev AS (
        SELECT t,
               CAST(count(*) FILTER (WHERE died AND arm = 1) AS BIGINT) AS d1,
               CAST(count(*) FILTER (WHERE died) AS BIGINT) AS d,
               CAST(count(*) FILTER (WHERE arm = 1) AS BIGINT) AS leave1,
               CAST(count(*) AS BIGINT) AS leaving
        FROM life GROUP BY t
    ), risk AS (
        SELECT t, d1, d,
               CAST(sum(leave1) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS BIGINT) AS n1,
               CAST(sum(leaving) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS BIGINT) AS n
        FROM ev
    ), contrib AS (
        SELECT d1, d,
               CAST(floor(CAST(d AS DOUBLE) * n1 / n * 1000000 + 0.5)
                    AS BIGINT) AS e1_q,
               CASE WHEN n > 1 THEN CAST(floor(
                   CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / n)
                   * (1.0 - CAST(n1 AS DOUBLE) / n)
                   * (CAST(n AS DOUBLE) - d) / (CAST(n AS DOUBLE) - 1.0)
                   * 1000000 + 0.5) AS BIGINT) ELSE 0 END AS v_q
        FROM risk WHERE d > 0
    ), s AS (
        SELECT CAST(sum(d1) AS BIGINT) AS o1,
               CAST(sum(d) AS BIGINT) AS d_total,
               CAST(sum(e1_q) AS BIGINT) AS e1q,
               CAST(sum(v_q) AS BIGINT) AS vq
        FROM contrib
    ), arms AS (
        SELECT arm,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(count(*) FILTER (WHERE died) AS BIGINT) AS observed
        FROM life GROUP BY arm
    )
    SELECT a.arm, a.n_users, a.observed,
           floor(CASE WHEN a.arm = 1 THEN CAST(s.e1q AS DOUBLE) / 1000000.0
                 ELSE CAST(s.d_total AS DOUBLE)
                      - CAST(s.e1q AS DOUBLE) / 1000000.0 END
                 * 1000000 + 0.5) / 1000000 AS expected,
           floor((CAST(s.o1 AS DOUBLE) - CAST(s.e1q AS DOUBLE) / 1000000.0)
                 / sqrt(CAST(s.vq AS DOUBLE) / 1000000.0)
                 * 1000000 + 0.5) / 1000000 AS z_arm1,
           floor((CAST(s.o1 AS DOUBLE) - CAST(s.e1q AS DOUBLE) / 1000000.0)
                 * (CAST(s.o1 AS DOUBLE) - CAST(s.e1q AS DOUBLE) / 1000000.0)
                 / (CAST(s.vq AS DOUBLE) / 1000000.0)
                 * 1000000 + 0.5) / 1000000 AS chi2
    FROM arms a CROSS JOIN s
    ORDER BY a.arm
    """,
    tags=("events", "survival", "logrank", "ab-test"),
)
def q_events_logrank_test(spark, sf_dir):
    """Log-rank test — the inferential companion to
    `events_kaplan_meier`: are the survival curves of the two
    deterministic A/B arms (user_id parity — the same even-split device
    as the experiment-readout family) distinguishable, or is the apparent
    gap chance?  The KM query draws the curve; this one says whether two
    curves differ — together they are the survival half of an experiment
    readout (the conversion half is `stats_two_proportion_z`).

    Statistic: at each distinct death time t, arm 1 contributes observed
    deaths d1_t against expected E1_t = d_t·n1_t/n_t under the null, with
    hypergeometric variance V_t = d_t·(n1_t/n_t)(1−n1_t/n_t)(n_t−d_t)/
    (n_t−1); z = (O1−E1)/√ΣV_t and chi² = z².  Death/censor bookkeeping
    is identical to the KM query (right-censored at the corpus end date).

    INTEGER-EXACT until the close: per-arm leaving/death counts are
    BIGINT, at-risk counts are reverse cumulative sums of integers over
    the lifetime-day grid, and each grid row's E and V contributions are
    quantized to integer micro-units BEFORE the order-sensitive sum (the
    CUPED/pinball convention) so both engines agree bit-wise.

    Scale: everything reduces to the per-user lifetime relation (one
    grouped agg over events) and then the distinct-lifetime-day grid —
    the global window is calendar-bounded exactly as argued for
    `events_kaplan_meier` (allow-listed in tests/test_plans.py).  Output:
    one row per arm (n, observed, expected) beside the shared (z, chi²)
    verdict."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    gmax = ev.agg(F.max(F.col("ts").cast("date")).alias("gd"))
    life = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.col("ts").cast("date")).alias("d0"),
            F.max(F.col("ts").cast("date")).alias("d1"),
        )
        .crossJoin(F.broadcast(gmax))
        .select(
            (F.col("user_id") % 2).cast("long").alias("arm"),
            F.datediff("d1", "d0").cast("long").alias("t"),
            (F.col("d1") < F.col("gd")).alias("died"),
        )
        .localCheckpoint(eager=False)
    )
    grid = life.groupBy("t").agg(
        F.sum(F.when(F.col("died") & (F.col("arm") == 1), 1).otherwise(0))
        .cast("long")
        .alias("d1"),
        F.sum(F.when(F.col("died"), 1).otherwise(0)).cast("long").alias("d"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("leave1"),
        F.count("*").cast("long").alias("leaving"),
    )
    w_rev = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = grid.select(
        "t",
        "d1",
        "d",
        F.sum("leave1").over(w_rev).cast("long").alias("n1"),
        F.sum("leaving").over(w_rev).cast("long").alias("n"),
    ).filter(F.col("d") > 0)
    nd = F.col("n").cast("double")
    p1 = F.col("n1").cast("double") / nd
    e1 = F.col("d").cast("double") * p1
    v = (
        F.col("d").cast("double")
        * p1
        * (F.lit(1.0) - p1)
        * (nd - F.col("d").cast("double"))
        / (nd - F.lit(1.0))
    )
    contrib = risk.select(
        "d1",
        "d",
        F.floor(e1 * 1000000 + F.lit(0.5)).cast("long").alias("e1_q"),
        F.when(F.col("n") > 1, F.floor(v * 1000000 + F.lit(0.5)).cast("long"))
        .otherwise(F.lit(0))
        .alias("v_q"),
    )
    s = contrib.agg(
        F.sum("d1").cast("long").alias("o1"),
        F.sum("d").cast("long").alias("d_total"),
        F.sum("e1_q").cast("long").alias("e1q"),
        F.sum("v_q").cast("long").alias("vq"),
    )
    arms = life.groupBy("arm").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum(F.when(F.col("died"), 1).otherwise(0)).cast("long").alias("observed"),
    )
    e1d = F.col("e1q").cast("double") / F.lit(1000000.0)
    zz = (F.col("o1").cast("double") - e1d) / F.sqrt(
        F.col("vq").cast("double") / F.lit(1000000.0)
    )
    canon = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return (
        arms.crossJoin(F.broadcast(s))
        .select(
            "arm",
            "n_users",
            "observed",
            canon(
                F.when(F.col("arm") == 1, e1d).otherwise(
                    F.col("d_total").cast("double") - e1d
                )
            ).alias("expected"),
            canon(zz).alias("z_arm1"),
            canon(zz * zz).alias("chi2"),
        )
        .orderBy("arm")
    )


# ---------------------------------------------------------------------------
# Weibull fit — parametric survival from the Kaplan-Meier curve
# ---------------------------------------------------------------------------


@register(
    "events_weibull_fit",
    oracle="""
    WITH life AS (
        SELECT user_id,
               CAST(date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE)))
                    AS BIGINT) AS t,
               (max(CAST(ts AS DATE))
                < (SELECT max(CAST(ts AS DATE)) FROM events)) AS died
        FROM life_src GROUP BY user_id
    ), ev AS (
        SELECT t,
               CAST(count(*) FILTER (WHERE died) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS leaving
        FROM life GROUP BY t
    ), risk AS (
        SELECT t, d, leaving,
               CAST(sum(leaving) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk
        FROM ev
    ), surv AS (
        SELECT t, d, n_risk,
               exp(sum(ln(1.0 - d / CAST(n_risk AS DOUBLE)))
                   OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)) AS s
        FROM risk WHERE d > 0
    ), pts AS (
        SELECT ln(CAST(t AS DOUBLE)) AS x, ln(-ln(s)) AS y
        FROM surv WHERE t > 0 AND s > 0.0 AND s < 1.0
    ), f AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
        FROM pts
    )
    SELECT n AS n_points,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS shape_k,
           round(exp(-((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n)
                     / ((n * sxy - sx * sy) / (n * sxx - sx * sx))), 4)
               AS scale_days,
           round(exp(-((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n)
                     / ((n * sxy - sx * sy) / (n * sxx - sx * sx)))
                 * pow(0.6931471805599453,
                       1.0 / ((n * sxy - sx * sy) / (n * sxx - sx * sx))), 4)
               AS median_days,
           round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM f
    WHERE n >= 2 AND (n * sxx - sx * sx) > 0 AND (n * sxy - sx * sy) <> 0
          AND (n * syy - sy * sy) > 0
    """.replace("life_src", "events"),
    tags=("events", "survival", "weibull", "parametric"),
)
def q_events_weibull_fit(spark, sf_dir):
    """Weibull survival fit — the PARAMETRIC step after
    `events_kaplan_meier` (the curve) and `events_logrank_test` (the
    comparison): S(t) = exp(−(t/λ)^k) linearizes to
    ln(−ln S) = k·ln t − k·ln λ, so regressing the KM curve's
    complementary-log-log against log lifetime gives the shape k
    (k < 1: churn hazard falls with tenure — the classic early-churn
    signature; k > 1: wear-out) and scale λ, and with them smooth
    extrapolation and the parametric median λ·(ln 2)^{1/k} that the
    step-function KM curve cannot provide beyond its last observed day.

    The KM inputs replicate `events_kaplan_meier`'s pipeline (exact
    integer d/n_risk ratios through exp∘Σln); the OLS runs over the
    bounded death-day grid (same calendar bound, allow-listed window),
    and every closing expression is written identically in both engines
    with round-6/4 canonicalization.

    Scale: identical to the KM query — one per-user grouped agg + grid
    windows over ≤|distinct lifetimes| rows; the regression is five
    scalar sums over that grid."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    gmax = ev.agg(F.max(F.col("ts").cast("date")).alias("gd"))
    life = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.col("ts").cast("date")).alias("d0"),
            F.max(F.col("ts").cast("date")).alias("d1"),
        )
        .crossJoin(F.broadcast(gmax))
        .select(
            F.datediff("d1", "d0").cast("long").alias("t"),
            (F.col("d1") < F.col("gd")).alias("died"),
        )
    )
    grid = life.groupBy("t").agg(
        F.sum(F.when(F.col("died"), 1).otherwise(0)).cast("long").alias("d"),
        F.count("*").cast("long").alias("leaving"),
    )
    w_rev = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = grid.select(
        "t", "d", F.sum("leaving").over(w_rev).cast("long").alias("n_risk")
    )
    w_fwd = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    surv = risk.filter(F.col("d") > 0).select(
        "t",
        F.exp(
            F.sum(F.log(F.lit(1.0) - F.col("d") / F.col("n_risk").cast("double"))).over(
                w_fwd
            )
        ).alias("s"),
    )
    pts = surv.filter(
        (F.col("t") > 0) & (F.col("s") > 0.0) & (F.col("s") < 1.0)
    ).select(
        F.log(F.col("t").cast("double")).alias("x"),
        F.log(-F.log("s")).alias("y"),
    )
    f = pts.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nD = F.col("n").cast("double")
    slope = (nD * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        nD * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / nD
    lam = F.exp(-intercept / slope)
    r2 = (
        (nD * F.col("sxy") - F.col("sx") * F.col("sy"))
        * (nD * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (
            (nD * F.col("sxx") - F.col("sx") * F.col("sx"))
            * (nD * F.col("syy") - F.col("sy") * F.col("sy"))
        )
    )
    # degenerate guard: a single usable death time (sf0.001) leaves the
    # regression underdetermined — emit no row, matching the oracle WHERE
    f = f.filter(
        (F.col("n") >= 2)
        & (nD * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
        & (nD * F.col("sxy") - F.col("sx") * F.col("sy") != 0)
        & (nD * F.col("syy") - F.col("sy") * F.col("sy") > 0)
    )
    return f.select(
        F.col("n").alias("n_points"),
        F.round(slope, 6).alias("shape_k"),
        F.round(lam, 4).alias("scale_days"),
        F.round(lam * F.pow(F.lit(0.6931471805599453), F.lit(1.0) / slope), 4).alias(
            "median_days"
        ),
        F.round(r2, 6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Markov entropy rate — how predictable is the behavior stream
# ---------------------------------------------------------------------------


@register(
    "events_markov_entropy_rate",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS cur,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events
    ), pairs AS (
        SELECT cur, nxt, count(*) AS n FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ), p AS (
        SELECT cur, nxt, n / (sum(n) OVER (PARTITION BY cur)) AS p
        FROM pairs
    ), states AS (
        SELECT DISTINCT cur AS state FROM p
    ), k AS (SELECT CAST(count(*) AS DOUBLE) AS kk FROM states),
    pi0 AS (
        SELECT state, 1.0 / (SELECT kk FROM k) AS pi FROM states
    ), pi1 AS (
        SELECT p.nxt AS state, sum(pi0.pi * p.p) AS pi
        FROM p JOIN pi0 ON pi0.state = p.cur GROUP BY p.nxt
    ), pi2 AS (
        SELECT p.nxt AS state, sum(pi1.pi * p.p) AS pi
        FROM p JOIN pi1 ON pi1.state = p.cur GROUP BY p.nxt
    ), pi3 AS (
        SELECT p.nxt AS state, sum(pi2.pi * p.p) AS pi
        FROM p JOIN pi2 ON pi2.state = p.cur GROUP BY p.nxt
    ), hs AS (
        SELECT cur AS state,
               CAST(sum(CAST(floor(-p * ln(p) * 1000000000 + 0.5) AS BIGINT))
                    AS BIGINT) AS h_q
        FROM p GROUP BY cur
    ), rate AS (
        SELECT CAST(sum(CAST(floor(pi3.pi * (CAST(hs.h_q AS DOUBLE) / 1000000000.0)
                                   * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS r_q,
               max((SELECT kk FROM k)) AS kk
        FROM pi3 JOIN hs ON hs.state = pi3.state
    )
    SELECT pi3.state AS state,
           round(pi3.pi, 9) AS pi,
           floor(CAST(hs.h_q AS DOUBLE) / 1000.0 + 0.5) / 1000000.0
               AS h_conditional,
           floor(CAST(r.r_q AS DOUBLE) / 1000.0 + 0.5) / 1000000.0
               AS entropy_rate,
           floor(ln(r.kk) * 1000000 + 0.5) / 1000000 AS max_entropy,
           floor(CAST(r.r_q AS DOUBLE) / 1000000000.0 / ln(r.kk) * 1000000 + 0.5)
               / 1000000 AS predictability_gap
    FROM pi3 JOIN hs ON hs.state = pi3.state CROSS JOIN rate r
    """,
    tags=("events", "markov", "entropy", "sequence"),
)
def q_events_markov_entropy_rate(spark, sf_dir):
    """Entropy rate of the empirical event-type Markov chain — HOW
    PREDICTABLE is the behavior stream: H = Σ_i π_i · H_i with
    H_i = −Σ_j p_ij ln p_ij, π from the same three power-iteration steps
    as `events_markov_stationary`.  The ratio H / ln(k) says how close
    user behavior is to uniformly random (1.0) vs deterministic ritual
    (0.0) — the one-number summary that decides whether next-event
    prediction is even worth modeling.  Completes the Markov family:
    transitions (the model), stationary (where attention settles),
    attribution (removal effects), entropy rate (how much signal).

    Exactness: transition probabilities are exact count ratios; each
    −p·ln(p) term and each π_i·H_i product is nano-quantized to BIGINT
    BEFORE its sum (the CUPED convention), so the only engine-shared
    float risk is libm's ln of identical doubles.

    Scale: events are scanned ONCE for the transition counts; everything
    after lives on the |types|² ≤ 25-row probability relation — three
    broadcast matvecs plus two 5-row aggregates."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"), F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    pairs = seq.groupBy("cur", "nxt").agg(F.count("*").alias("n"))
    wt = Window.partitionBy("cur")
    p = pairs.select(
        "cur", "nxt", (F.col("n") / F.sum("n").over(wt)).alias("p")
    ).localCheckpoint(eager=False)
    states = p.select(F.col("cur").alias("state")).distinct()
    k = states.agg(F.count("*").cast("double").alias("kk"))
    pi = states.crossJoin(F.broadcast(k)).select(
        "state", (F.lit(1.0) / F.col("kk")).alias("pi")
    )
    for _ in range(3):
        pi = (
            p.join(F.broadcast(pi.withColumnRenamed("state", "cur")), "cur")
            .groupBy(F.col("nxt").alias("state"))
            .agg(F.sum(F.col("pi") * F.col("p")).alias("pi"))
        )
    hs = p.groupBy(F.col("cur").alias("state")).agg(
        F.sum(
            F.floor(-F.col("p") * F.log("p") * 1000000000 + F.lit(0.5)).cast("long")
        )
        .cast("long")
        .alias("h_q")
    )
    joined = pi.join(hs, "state").localCheckpoint(eager=False)
    rate = joined.crossJoin(F.broadcast(k)).agg(
        F.sum(
            F.floor(
                F.col("pi")
                * (F.col("h_q").cast("double") / F.lit(1000000000.0))
                * 1000000000
                + F.lit(0.5)
            ).cast("long")
        )
        .cast("long")
        .alias("r_q"),
        F.max("kk").alias("kk"),
    )
    milli = lambda c: F.floor(c.cast("double") / F.lit(1000.0) + F.lit(0.5)) / F.lit(  # noqa: E731
        1000000.0
    )
    canon = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return joined.crossJoin(F.broadcast(rate)).select(
        "state",
        F.round("pi", 9).alias("pi"),
        milli(F.col("h_q")).alias("h_conditional"),
        milli(F.col("r_q")).alias("entropy_rate"),
        canon(F.log("kk")).alias("max_entropy"),
        canon(
            F.col("r_q").cast("double") / F.lit(1000000000.0) / F.log("kk")
        ).alias("predictability_gap"),
    )


# ---------------------------------------------------------------------------
# Bass diffusion — innovation/imitation fit of the adoption curve
# ---------------------------------------------------------------------------




@register(
    "orders_bass_diffusion",
    oracle="""
    WITH adopt AS (
        SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS day
        FROM orders GROUP BY o_custkey
    ), g AS (
        SELECT day, CAST(count(*) AS BIGINT) AS dn FROM adopt GROUP BY day
    ), c AS (
        SELECT day, dn,
               CAST(COALESCE(sum(dn) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                    PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS nprev
        FROM g
    ), sc AS (
        SELECT nprev / 1000.0 AS x, dn / 1000.0 AS y FROM c
    ), m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS q1,
               CAST(sum(CAST(floor(x * x * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS q2,
               CAST(sum(CAST(floor(x * x * x * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS q3,
               CAST(sum(CAST(floor(x * x * x * x * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS q4,
               CAST(sum(CAST(floor(y * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS qy,
               CAST(sum(CAST(floor(x * y * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS qxy,
               CAST(sum(CAST(floor(x * x * y * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS qxxy
        FROM sc
    ), mm AS (
        SELECT CAST(n AS DOUBLE) AS n,
               q1 / 1000000.0 AS sx, q2 / 1000000.0 AS sxx,
               q3 / 1000000.0 AS sxxx, q4 / 1000000.0 AS sxxxx,
               qy / 1000000.0 AS sy, qxy / 1000000.0 AS sxy,
               qxxy / 1000000.0 AS sxxy
        FROM m
    ), sol AS (
        SELECT n, sy,
               (n * (sxx * sxxxx - sxxx * sxxx)
                - sx * (sx * sxxxx - sxxx * sxx)
                + sxx * (sx * sxxx - sxx * sxx)) AS det,
               (sy * (sxx * sxxxx - sxxx * sxxx)
                - sx * (sxy * sxxxx - sxxx * sxxy)
                + sxx * (sxy * sxxx - sxx * sxxy)) AS deta,
               (n * (sxy * sxxxx - sxxy * sxxx)
                - sy * (sx * sxxxx - sxxx * sxx)
                + sxx * (sx * sxxy - sxy * sxx)) AS detb,
               (n * (sxx * sxxy - sxxx * sxy)
                - sx * (sx * sxxy - sxy * sxx)
                + sy * (sx * sxxx - sxx * sxx)) AS detc
        FROM mm
    ), coef AS (
        SELECT n, sy, deta / det AS a, detb / det AS b, detc / det AS c
        FROM sol WHERE det <> 0
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(floor(sy * 1000 + 0.5) AS BIGINT) AS n_adopters,
           round(a, 9) AS a, round(b, 9) AS b, round(c, 9) AS c,
           CASE WHEN c < 0 AND b * b - 4 * a * c >= 0 THEN
               round((-b - sqrt(b * b - 4 * a * c)) / (2 * c) * 1000.0, 2)
           END AS m_potential,
           CASE WHEN c < 0 AND b * b - 4 * a * c >= 0
                     AND (-b - sqrt(b * b - 4 * a * c)) / (2 * c) > 0 THEN
               round(a / ((-b - sqrt(b * b - 4 * a * c)) / (2 * c)), 9)
           END AS p_innovation,
           CASE WHEN c < 0 AND b * b - 4 * a * c >= 0
                     AND (-b - sqrt(b * b - 4 * a * c)) / (2 * c) > 0 THEN
               round(b + a / ((-b - sqrt(b * b - 4 * a * c)) / (2 * c)), 9)
           END AS q_imitation
    FROM coef
    """,
    tags=("orders", "diffusion", "bass", "adoption"),
)
def q_orders_bass_diffusion(spark, sf_dir):
    """Bass diffusion fit of CUSTOMER acquisition (Bass 1969, public):
    daily first-order counts dN regressed on cumulative adopters N,
    dN = a + b·N + c·N², identifying innovation p = a/m, imitation
    q = b + p, and market potential m (positive root of c·m² + b·m + a)
    — "is acquisition marketing-driven (p) or word-of-mouth (q), and
    where does it saturate".  Complements `retention_cohorts` (who
    stays) with who ARRIVES.  On this synthetic corpus arrivals are
    near-uniform, so the honest verdict is c ≈ 0 / q ≈ p-scale noise —
    the no-contagion null, exactly what a diffusion fit should say
    about a Poisson arrival stream.

    Exactness: adoption counts are BIGINT; N is rescaled to kilo-
    adopters and every power/cross moment is quantized to integer
    micro-units PER DAY-ROW before its sum (Σx⁴ in raw adopters
    overflows 2^63 past ~30k customers — the rescale+quantize keeps all
    eight moments BIGINT-exact through sf1, documented); the quadratic
    solve is the `ts_segmented_trend` symbolic Cramer; root/ratio
    outputs are guarded CASEs.

    Scale: one per-customer min + one day-grid agg; cumulative adopters
    ride the calendar-bounded day grid (allow-listed); O(1) algebra."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    adopt = o.groupBy("o_custkey").agg(
        F.min(F.col("o_orderdate").cast("date")).alias("day")
    )
    g = adopt.groupBy("day").agg(F.count("*").cast("long").alias("dn"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    c = g.select(
        "day",
        "dn",
        F.coalesce(F.sum("dn").over(w), F.lit(0)).cast("long").alias("nprev"),
    )
    x = F.col("nprev") / F.lit(1000.0)
    y = F.col("dn") / F.lit(1000.0)
    qz = lambda e: F.sum(F.floor(e * 1000000 + F.lit(0.5)).cast("long")).cast("long")  # noqa: E731
    m = c.agg(
        F.count("*").cast("long").alias("n"),
        qz(x).alias("q1"),
        qz(x * x).alias("q2"),
        qz(x * x * x).alias("q3"),
        qz(x * x * x * x).alias("q4"),
        qz(y).alias("qy"),
        qz(x * y).alias("qxy"),
        qz(x * x * y).alias("qxxy"),
    )
    mm = m.select(
        F.col("n").cast("double").alias("n"),
        (F.col("q1") / F.lit(1000000.0)).alias("sx"),
        (F.col("q2") / F.lit(1000000.0)).alias("sxx"),
        (F.col("q3") / F.lit(1000000.0)).alias("sxxx"),
        (F.col("q4") / F.lit(1000000.0)).alias("sxxxx"),
        (F.col("qy") / F.lit(1000000.0)).alias("sy"),
        (F.col("qxy") / F.lit(1000000.0)).alias("sxy"),
        (F.col("qxxy") / F.lit(1000000.0)).alias("sxxy"),
    )
    D = lambda cn: F.col(cn)  # noqa: E731
    det = (
        D("n") * (D("sxx") * D("sxxxx") - D("sxxx") * D("sxxx"))
        - D("sx") * (D("sx") * D("sxxxx") - D("sxxx") * D("sxx"))
        + D("sxx") * (D("sx") * D("sxxx") - D("sxx") * D("sxx"))
    )
    deta = (
        D("sy") * (D("sxx") * D("sxxxx") - D("sxxx") * D("sxxx"))
        - D("sx") * (D("sxy") * D("sxxxx") - D("sxxx") * D("sxxy"))
        + D("sxx") * (D("sxy") * D("sxxx") - D("sxx") * D("sxxy"))
    )
    detb = (
        D("n") * (D("sxy") * D("sxxxx") - D("sxxy") * D("sxxx"))
        - D("sy") * (D("sx") * D("sxxxx") - D("sxxx") * D("sxx"))
        + D("sxx") * (D("sx") * D("sxxy") - D("sxy") * D("sxx"))
    )
    detc = (
        D("n") * (D("sxx") * D("sxxy") - D("sxxx") * D("sxy"))
        - D("sx") * (D("sx") * D("sxxy") - D("sxy") * D("sxx"))
        + D("sy") * (D("sx") * D("sxxx") - D("sxx") * D("sxx"))
    )
    coef = (
        mm.select(
            "n",
            "sy",
            det.alias("det"),
            deta.alias("deta"),
            detb.alias("detb"),
            detc.alias("detc"),
        )
        .filter(F.col("det") != 0)
        .select(
            "n",
            "sy",
            (F.col("deta") / F.col("det")).alias("a"),
            (F.col("detb") / F.col("det")).alias("b"),
            (F.col("detc") / F.col("det")).alias("c"),
        )
    )
    disc = F.col("b") * F.col("b") - 4 * F.col("a") * F.col("c")
    mmx = (-F.col("b") - F.sqrt(disc)) / (2 * F.col("c"))
    ok_m = (F.col("c") < 0) & (disc >= 0)
    ok_pq = ok_m & (mmx > 0)
    return coef.select(
        F.col("n").cast("long").alias("n_days"),
        F.floor(F.col("sy") * 1000 + F.lit(0.5)).cast("long").alias("n_adopters"),
        F.round("a", 9).alias("a"),
        F.round("b", 9).alias("b"),
        F.round("c", 9).alias("c"),
        F.when(ok_m, F.round(mmx * F.lit(1000.0), 2)).alias("m_potential"),
        F.when(ok_pq, F.round(F.col("a") / mmx, 9)).alias("p_innovation"),
        F.when(ok_pq, F.round(F.col("b") + F.col("a") / mmx, 9)).alias("q_imitation"),
    )
