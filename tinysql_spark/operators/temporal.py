"""Temporal operators over `events`: as-of join, range join,
hypertable-style rollup.

The reference has none of these (SURVEY §2: joins are equi-only,
`planner/core/logical_plans.go:96-99`; no window functions) — they are
beyond-reference custom operators, each expressed as a composition of
built-in DataFrame ops chosen for its shuffle profile at 100 TB:

- as-of join: NOT an inequality join (quadratic worst case) but a
  union + running-max window — one shuffle on user_id, linear state.
- range join: NOT `ON abs(a.ts-b.ts) <= W` (cartesian per user) but
  bucketized candidates — bin ts to W-sized buckets, explode one side
  to its 3 adjacent bins, equi-join on (user, bin), exact filter.
  Each qualifying pair matches exactly once (the other side has one
  bin), so no dedup pass is needed.
- rollup: native `df.rollup` → Spark plans a single Expand + one
  aggregate, the same partial/final split as any hash agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

_RANGE_W = 300  # seconds


@register(
    "q19_asof_join",
    oracle="""
    SELECT c.event_id, c.user_id, c.ts,
           max(p.ts) AS last_purchase_ts,
           count(p.event_id) AS n_purchases_before
    FROM events c LEFT JOIN events p
      ON p.user_id = c.user_id AND p.event_type = 'purchase'
         AND p.ts <= c.ts
    WHERE c.event_type = 'click'
    GROUP BY 1, 2, 3
    """,
    doc="As-of join: each click matched to the user's most recent "
    "purchase at-or-before it. Linear formulation: union both event "
    "streams tagged, one window over (user_id, ts) with running "
    "max/count of the purchase side — a single shuffle, no pair "
    "blowup, vs. the oracle's O(clicks x purchases) inequality join.",
)
def q19_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    both = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        # purchases sort before clicks at equal ts so at-or-before holds
        F.when(F.col("event_type") == "purchase", F.lit(0)).otherwise(F.lit(1)).alias("tag"),
        F.when(F.col("event_type") == "purchase", F.col("ts")).alias("p_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        both.withColumn("last_purchase_ts", F.max("p_ts").over(w))
        .withColumn("n_purchases_before", F.count("p_ts").over(w))
        .filter(F.col("tag") == 1)
        .select("event_id", "user_id", "ts", "last_purchase_ts", "n_purchases_before")
    )


@register(
    "q20_range_join",
    oracle=f"""
    SELECT a.event_id AS a_id, b.event_id AS b_id,
           date_diff('second', a.ts, b.ts) AS dt_sec
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
         AND abs(date_diff('second', a.ts, b.ts)) <= {_RANGE_W}
    """,
    doc="Range (interval) join: same-user event pairs within 300 s. "
    "Bucketized: bin ts to 300 s buckets, explode the left side to its "
    "3 adjacent bins, equi-join on (user_id, bin), exact time filter. "
    "Candidate space is O(events x density-per-bin), never cartesian "
    "per user; each true pair matches in exactly one bin.",
)
def q20_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("sec")
    )
    bin_ = (F.col("sec") / _RANGE_W).cast("long")
    a = ev.select(
        F.col("event_id").alias("a_id"),
        "user_id",
        F.col("sec").alias("a_sec"),
        F.explode(F.array(bin_ - 1, bin_, bin_ + 1)).alias("bin"),
    )
    b = ev.select(
        F.col("event_id").alias("b_id"),
        "user_id",
        F.col("sec").alias("b_sec"),
        bin_.alias("bin"),
    )
    dt = F.col("b_sec") - F.col("a_sec")
    return (
        a.join(b, ["user_id", "bin"])
        .filter((F.col("a_id") < F.col("b_id")) & (F.abs(dt) <= _RANGE_W))
        .select("a_id", "b_id", dt.alias("dt_sec"))
    )


@register(
    "q21_hypertable_rollup",
    oracle="""
    SELECT CASE WHEN GROUPING(date_trunc('day', ts)) = 1 THEN 'ALL'
                ELSE strftime(date_trunc('day', ts), '%Y-%m-%d') END AS day,
           CASE WHEN GROUPING(date_trunc('hour', ts)) = 1 THEN 'ALL'
                ELSE strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') END AS hour,
           CASE WHEN GROUPING(event_type) = 1 THEN 'ALL'
                ELSE event_type END AS event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY ROLLUP(date_trunc('day', ts), date_trunc('hour', ts), event_type)
    """,
    doc="Hypertable-style continuous-aggregate rollup: one pass "
    "produces hour, day, and total resolutions via ROLLUP (Spark "
    "Expand + single partial/final hash agg — no re-scan per level). "
    "Rolled-up levels render as 'ALL' so the result is hash-stable.",
)
def q21_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("day_t"),
        F.date_trunc("hour", "ts").alias("hour_t"),
        "event_type",
        "value",
    )
    return ev.rollup("day_t", "hour_t", "event_type").agg(
        F.grouping("day_t").alias("g_day"),
        F.grouping("hour_t").alias("g_hour"),
        F.grouping("event_type").alias("g_et"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    ).select(
        F.when(F.col("g_day") == 1, F.lit("ALL"))
        .otherwise(F.date_format("day_t", "yyyy-MM-dd"))
        .alias("day"),
        F.when(F.col("g_hour") == 1, F.lit("ALL"))
        .otherwise(F.date_format("hour_t", "yyyy-MM-dd HH:00"))
        .alias("hour"),
        F.when(F.col("g_et") == 1, F.lit("ALL"))
        .otherwise(F.col("event_type"))
        .alias("event_type"),
        "n_events",
        "sum_value",
    )


@register(
    "q41_gap_fill",
    late=True,
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
      FROM events WHERE event_type = 'purchase'
    ), hours AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
    ), actual AS (
      SELECT date_trunc('hour', ts) AS h, count(*) AS n
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT strftime(hours.h, '%Y-%m-%d %H:00') AS hour_bucket,
           CAST(coalesce(actual.n, 0) AS BIGINT) AS n_events
    FROM hours LEFT JOIN actual ON hours.h = actual.h
    """,
    doc="Time-series gap filling (timescale-style time_bucket_gapfill): "
    "generate the dense hour spine from the data's own bounds "
    "(sequence() exploded from a 1-row aggregate — stays in the plan, "
    "no driver round-trip), left-join the sparse hourly counts, fill "
    "zeros. The spine side is tiny (hours between bounds) and "
    "broadcasts; the aggregate side is one partial-agg shuffle. The "
    "dense output is what rollup dashboards and window-over-time "
    "models need — missing buckets are rows, not absences.",
)
def q41_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(F.date_trunc("hour", "ts").alias("h"))
    )
    bounds = ev.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    hours = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("h")
    )
    actual = ev.groupBy("h").agg(F.count(F.lit(1)).alias("n"))
    return (
        F.broadcast(hours)
        .join(actual, "h", "left")
        .select(
            F.date_format("h", "yyyy-MM-dd HH:00").alias("hour_bucket"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        )
    )


@register(
    "q53_funnel_depth",
    late=True,
    oracle="""
    WITH u AS (
      SELECT DISTINCT user_id FROM events
    ), s AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), v AS (
      SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'view' AND e.ts > s.t GROUP BY e.user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS t FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS t FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t GROUP BY e.user_id
    )
    SELECT u.user_id,
           CASE WHEN p.t IS NOT NULL THEN 4
                WHEN c.t IS NOT NULL THEN 3
                WHEN v.t IS NOT NULL THEN 2
                WHEN s.t IS NOT NULL THEN 1
                ELSE 0 END AS funnel_depth
    FROM u
      LEFT JOIN s USING (user_id)
      LEFT JOIN v USING (user_id)
      LEFT JOIN c USING (user_id)
      LEFT JOIN p USING (user_id)
    """,
    doc="Ordered funnel analysis (signup -> view -> click -> "
    "purchase): each user's depth is the longest STRICTLY ORDERED "
    "first-occurrence chain — the next stage's event must come after "
    "the previous stage's first occurrence, which a flat per-type "
    "min() cannot express (a view before signup must not count). "
    "Four staged conditional aggregations, each joined back on "
    "user_id; stage tables shrink monotonically (user cardinality, "
    "then funnel attrition), so at scale every stage join after the "
    "first is a broadcast of survivors against the partitioned fact "
    "scan, and Spark reuses the one hash partitioning on user_id "
    "across the chain — the analytics-funnel idiom ClickHouse ships "
    "as windowFunnel(), expressed relationally.",
)
def q53_funnel_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.select("user_id").distinct()
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_s"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t_s"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_v"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_v"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_c"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_c"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_p"))
    )
    return (
        u.join(s, "user_id", "left")
        .join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.when(F.col("t_p").isNotNull(), 4)
            .when(F.col("t_c").isNotNull(), 3)
            .when(F.col("t_v").isNotNull(), 2)
            .when(F.col("t_s").isNotNull(), 1)
            .otherwise(0)
            .alias("funnel_depth"),
        )
    )


@register(
    "q54_retention_cohorts",
    late=True,
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    )
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
           CAST(floor(date_diff('day', cohort, wk) / 7) AS BIGINT) AS week_offset,
           count(*) AS n_active
    FROM activity JOIN first_seen USING (user_id)
    GROUP BY 1, 2
    """,
    doc="Weekly retention-cohort matrix: users grouped by first-seen "
    "week, counted in every subsequent week they were active — the "
    "growth-analytics staple. Two aggregations plus one join, all "
    "keyed on user_id, so Spark REUSES a single hash partitioning "
    "across first-seen, distinct-activity and the join (zero extra "
    "shuffles; the final cohort-cell aggregation is the only new "
    "exchange, and its cardinality is cohorts x offsets — tiny). "
    "Week offsets are exact integer arithmetic: both engines "
    "truncate weeks to Monday, so the day difference is always a "
    "multiple of 7 (a raw date_diff('week') would count boundary "
    "crossings and diverge).",
)
def q54_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            F.floor(
                F.datediff(F.col("wk").cast("date"), F.col("cohort").cast("date")) / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@register(
    "q67_ohlc_bars",
    late=True,
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS bucket,
           event_type,
           round(arg_min(value, printf('%020d-%010d', epoch_us(ts), event_id)), 2) AS open_v,
           round(max(value), 2) AS high_v,
           round(min(value), 2) AS low_v,
           round(arg_max(value, printf('%020d-%010d', epoch_us(ts), event_id)), 2) AS close_v,
           count(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
    doc="OHLC time-bucket bars (the TimescaleDB/kdb financial-rollup "
    "staple): per hour per event_type, the FIRST and LAST value in "
    "event-time order (open/close) plus the extrema (high/low). "
    "Open/close are min_by/max_by over a composite (epoch_us, "
    "event_id) string key — the event_id tiebreak makes "
    "equal-timestamp rows deterministic across engines AND across "
    "partitionings (a bare min_by(ts) would be nondeterministic "
    "under ties). One hash aggregation, partial->final split, no "
    "window, no sort — the scan streams straight into map-side "
    "combine at any scale. Values are per-row doubles (no sums), so "
    "only display rounding is applied.",
)
def q67_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    key = F.format_string(
        "%020d-%010d",
        F.unix_micros(F.col("ts").cast("timestamp")),
        F.col("event_id"),
    )
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias(
                "bucket"
            ),
            "event_type",
        )
        .agg(
            F.round(F.min_by("value", key), 2).alias("open_v"),
            F.round(F.max("value"), 2).alias("high_v"),
            F.round(F.min("value"), 2).alias("low_v"),
            F.round(F.max_by("value", key), 2).alias("close_v"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# --------------------------------------------------------------------------
# q71 — SCD Type-2 dimension build (change capture -> validity
# intervals), the warehouse operator every event-sourced dimension
# needs; q72/st14 consume the intervals it produces
# --------------------------------------------------------------------------


@register(
    "q71_scd2_build",
    late=True,
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
      WHERE event_type IN ('signup', 'purchase')
    ), chg AS (
      SELECT user_id, ts, event_id, event_type FROM o
      WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id,
           event_type AS attr,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS BIGINT) AS version_no,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             AS is_current
    FROM chg
    """,
    doc="SCD Type-2 dimension build — change-data capture into "
    "validity intervals (Kimball's slowly-changing-dimension type 2, "
    "the shape every event-sourced warehouse dimension takes): the "
    "LIFECYCLE events (signup/purchase — the sparse subset that "
    "defines a user's state, vs the click/view fact firehose) are "
    "change-detected per user (a version starts where the state "
    "differs from the previous one, lag() over (user, ts, event_id) "
    "— the event_id tiebreak makes equal-timestamp rows "
    "deterministic across engines and partitionings; consecutive "
    "same-state events collapse into one version), then "
    "each change row becomes a version with [valid_from, valid_to) "
    "from its own ts and the NEXT change's ts (lead(); NULL marks "
    "the open current version) plus a per-user version_no. Two "
    "window passes over ONE partitioning (user_id) — Catalyst "
    "plans a single exchange and reuses the sort for the second "
    "Window, so the 100 TB cost is one shuffle of the change rows. "
    "No reference analog (no window functions in the grammar — "
    "SURVEY §2.1); q72_scd2_asof_enrich and st14 consume these "
    "intervals.",
)
def q71_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scd2_dimension(load_table(spark, sf_dir, "events"))


# the sparse state-defining subset: lifecycle actions, not the
# click/view fact firehose (a dimension that changed on every fact
# row would degenerate the q72/st14 contingency to its diagonal)
_SCD2_STATES = ("signup", "purchase")


def scd2_dimension(ev: DataFrame) -> DataFrame:
    """The SCD-2 build as a reusable transform over (user_id, ts,
    event_id, event_type) — shared by q71 (the dimension itself),
    q72 (batch as-of enrichment) and st14 (the stream-static
    temporal join). Both windows share one (user_id)-partitioned
    sort, so the plan carries a single exchange."""
    ev = ev.filter(F.col("event_type").isin(*_SCD2_STATES))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
    )
    return chg.select(
        "user_id",
        F.col("event_type").alias("attr"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).cast("long").alias("version_no"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@register(
    "q72_scd2_asof_enrich",
    late=True,
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
      WHERE event_type IN ('signup', 'purchase')
    ), chg AS (
      SELECT user_id, ts, event_id, event_type FROM o
      WHERE prev IS NULL OR prev <> event_type
    ), dim AS (
      SELECT user_id, event_type AS attr, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM chg
    )
    SELECT d.attr AS state, e.event_type,
           count(*) AS n_events,
           round(sum(e.value), 2) AS sum_value
    FROM events e JOIN dim d
      ON d.user_id = e.user_id
         AND e.ts >= d.valid_from
         AND (d.valid_to IS NULL OR e.ts < d.valid_to)
    GROUP BY 1, 2
    """,
    doc="As-of DIMENSION LOOKUP against the q71 SCD-2 intervals — the "
    "consumption side of slowly-changing dimensions: every event "
    "joins the version of the user's lifecycle state (last signup/"
    "purchase) that was valid AT ITS OWN event time ([valid_from, "
    "valid_to) — valid_from inclusive, so the event that caused a "
    "change reads its own new state; the open current version "
    "matches via NULL valid_to; facts before a user's first "
    "lifecycle event have no state and drop from the inner join), "
    "then the (state, event_type) contingency aggregate answers "
    "'what happens while users are in state X'. NOT executed as an "
    "inequality join: the user_id equi-key carries the join (one "
    "shuffle on user_id; versions-per-user is bounded by the "
    "change count, so the per-key candidate set stays small), with "
    "the interval test as the residual — the plan a 100 TB "
    "event-x-dimension lookup needs. Each event matches exactly "
    "one interval by construction (intervals tile the user's "
    "timeline; zero-length intervals from equal-ts changes match "
    "nothing on both engines).",
)
def q72_scd2_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return scd2_asof_enrich(ev, scd2_dimension(ev))


def scd2_asof_enrich(ev: DataFrame, dim: DataFrame) -> DataFrame:
    """The temporal-validity join + contingency agg shared by q72
    (batch) and st14 (the same transform over a streaming events
    DataFrame — stateless inner stream-static join, so it applies
    unchanged)."""
    d = dim.select(
        F.col("user_id").alias("d_user"), "attr", "valid_from", "valid_to"
    )
    return (
        ev.join(
            d,
            (ev["user_id"] == d["d_user"])
            & (ev["ts"] >= d["valid_from"])
            & (d["valid_to"].isNull() | (ev["ts"] < d["valid_to"])),
        )
        .groupBy(F.col("attr").alias("state"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
