"""Incremental rollup maintenance — materialized-view partials for the
distinct-user / count / sum analytics families.

At 100 TB the serving tier must not rescan the fact for every dashboard
refresh. DAU/WAU/engagement queries aggregate an APPEND-ONLY event
stream whose history never changes, so a ``(event_date, user_id,
event_type)`` partial-aggregate table — O(active users × days), usually
3–5 orders of magnitude smaller than events — serves those families
EXACTLY:

- ``count(DISTINCT user_id)`` per day/week/type is exact from
  user-grain partials (the partial keeps the user dimension, so the
  final distinct is a count of partial rows / a distinct over days).
- counts and value sums are additive; values are quantized to integer
  micro-units at the partial (BIGINT — order-invariant, the engine-wide
  sum-then-floor rule), so re-aggregation is exact under any merge
  order.

Maintenance is per incremental interval (the reference's 15-min unit,
cf. Airflow replay semantics in `dags/reciping_pipeline_dag.py`):
recompute ONLY the event-date partitions the interval touched and
dynamic-partition-overwrite them. Idempotent by construction —
re-running an interval rewrites the same partitions to the same
content — and cost ∝ the touched days' events, never table size (the
same discipline as `pipeline/silver.py`'s pruned anti-join).

Correctness contract: the serving queries are driver-hash-oracled
against the DIRECT computation over raw events in DuckDB
(`queries/rollupserve.py`) — the partial table is an invisible
optimization; results are exactly equal.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from reciping_data_pipeline_spark.sources import writers

#: micro-unit grid for the additive value sum (engine-wide rule: exact
#: BIGINT sums, order-invariant; 3+ decimal orders below reported 2 dp)
_VALUE_UNIT = 1_000_000


def user_day_rollup(events: DataFrame) -> DataFrame:
    """One partial row per (event_date, user_id, event_type): event
    count + integer-unit value sum. The finest grain any serving query
    below needs — user-level, so exact COUNT(DISTINCT) survives the
    rollup."""
    return events.groupBy(
        F.col("ts").cast("date").alias("event_date"),
        "user_id",
        "event_type",
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(
            F.floor(F.col("value") * _VALUE_UNIT + F.lit(0.5)).cast("long")
        ).alias("value_u"),
    )


def maintain_user_day_rollup(
    spark: SparkSession,
    events: DataFrame,
    rollup_path: str,
    *,
    events_path: str | None = None,
    touched_dates: list[str] | None = None,
) -> list[str]:
    """Incrementally maintain the rollup at ``rollup_path`` from an
    interval's (already event-id-deduped) events: recompute the partial
    rows for exactly the event-dates present in the batch and
    dynamic-partition-overwrite those partitions.

    Recompute-and-replace (vs additive merge) is chosen deliberately:
    it is idempotent under re-delivery of the SAME interval without any
    read-side bookkeeping, and its cost is bounded by the touched days'
    events — on a date-partitioned warehouse that's one pruned scan.

    ``events_path`` closes the late-data hole BY CONSTRUCTION (ADVICE
    r09): when given, the recompute source is the COMMITTED events
    table pruned to the touched days — so a caller passing only a
    late-arriving sliver of an old day still rewrites that day from its
    full history (the streaming flavor's pattern). Without it, the
    batch itself is the source and the caller owns the
    union-of-the-day contract (gold.run_incremental's pruned-read
    pattern). The ``events`` argument then only names the touched days
    — one column-pruned distinct, never a second full aggregation (the
    r09 double-execution fix).

    ``touched_dates`` (ISO strings) skips that distinct when the caller
    already knows the days (streaming derives them pre-anti-join so a
    replay whose rows all drop out still repairs the rollup).
    Returns the ISO dates rewritten (O(touched days))."""
    if touched_dates is None:
        touched_dates = [
            r["d"]
            for r in events.select(
                F.col("ts").cast("date").cast("string").alias("d")
            )
            .distinct()
            .collect()
        ]
    if not touched_dates:
        return []
    if events_path is not None:
        committed = writers.read_table(spark, events_path)
        # prune on the partition column when the table is
        # date-partitioned (directory pruning — the touched days are
        # the only ones read); fall back to the ts-derived date.
        day = (
            F.col("event_date").cast("string")
            if "event_date" in committed.columns
            else F.col("ts").cast("date").cast("string")
        )
        source = committed.where(day.isin(touched_dates))
    else:
        source = events.where(
            F.col("ts").cast("date").cast("string").isin(touched_dates)
        )
    writers.overwrite_partitions(user_day_rollup(source), rollup_path, ["event_date"])
    return touched_dates


def read_user_day_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    return writers.read_table(spark, rollup_path)


def dau_from_rollup(rollup: DataFrame) -> DataFrame:
    """DAU.sql shape served from partials: one partial row per
    (day, user, type) means the exact distinct is a COUNT(*) and the
    event count a SUM — no touch of the fact."""
    return rollup.groupBy(
        F.col("event_date").cast("string").alias("event_date"), "event_type"
    ).agg(
        F.count("*").alias("dau"),
        F.sum("n_events").alias("event_count"),
    )


def wau_from_rollup(rollup: DataFrame) -> DataFrame:
    """Weekly active users from partials: distinct (week, user) over
    the O(users×days) rollup instead of the events fact."""
    wk = rollup.select(
        F.date_trunc("week", F.col("event_date")).cast("date").cast("string").alias(
            "week_start"
        ),
        "user_id",
    ).distinct()
    return wk.groupBy("week_start").agg(F.count("*").alias("wau"))


def _ab_segment(user_col):
    """AB-group segment derived from user_id — the same integer
    arithmetic as queries/groupingsets.py's ``_AB_SEG`` (the sf events
    table has no user dim, so the segment is a deterministic function
    both engines compute identically)."""
    m = F.pmod(user_col, F.lit(3)).cast("int")
    return (
        F.when(m == 0, F.lit("control"))
        .when(m == 1, F.lit("variant_a"))
        .otherwise(F.lit("variant_b"))
    )


def dau_segments_from_rollup(rollup: DataFrame) -> DataFrame:
    """The reference's ACTUAL `DAU.sql` shape — a TOTAL / per-segment /
    per-AB-group UNION ALL stack of daily uniques (`sql_queries/DAU.sql`
    lines 1-52) — served entirely from the user-day partials.

    Every stack dimension is available at the partial grain: event_type
    is a grain column, and the AB group is functionally dependent on
    user_id (also a grain column), so no grain extension is needed —
    the user-grain partial subsumes every functionally-dependent
    segment. Exactness per block: TOTAL and AB re-distinct user_id over
    partials (a user appears once per (day, type)); the EVENT_TYPE
    block's distinct is a plain COUNT(*) because (day, user, type) rows
    are unique. Fact-free: the plan scans only the rollup
    (tests/test_rollups.py plan gate)."""
    day = F.col("event_date").cast("string").alias("event_date")
    total = (
        rollup.groupBy(day)
        .agg(F.countDistinct("user_id").alias("dau"))
        .select(
            "event_date",
            F.lit("TOTAL").alias("segment_type"),
            F.lit("ALL").alias("segment_value"),
            "dau",
        )
    )
    by_type = (
        rollup.groupBy(day, F.col("event_type").alias("segment_value"))
        .agg(F.count("*").alias("dau"))
        .select(
            "event_date",
            F.lit("EVENT_TYPE").alias("segment_type"),
            "segment_value",
            "dau",
        )
    )
    by_ab = (
        rollup.groupBy(day, _ab_segment(F.col("user_id")).alias("segment_value"))
        .agg(F.countDistinct("user_id").alias("dau"))
        .select(
            "event_date",
            F.lit("AB_GROUP").alias("segment_type"),
            "segment_value",
            "dau",
        )
    )
    return total.unionAll(by_type).unionAll(by_ab)


def user_week_rollup(day_rollup: DataFrame) -> DataFrame:
    """(week_start, user_id, event_type) DISTINCT partials derived from
    the day rollup — the second-level partial that makes WAU serving
    O(users×weeks) instead of O(users×days) (VERDICT r09 #3: the
    day-grain rollup compresses events only ~1.2× on a uniform fixture,
    so a week-level distinct over it barely beats the fact; this grain
    removes the within-week day multiplicity before serving)."""
    return day_rollup.select(
        F.date_trunc("week", F.col("event_date")).cast("date").alias("week_start"),
        "user_id",
        "event_type",
    ).distinct()


def maintain_user_week_rollup(
    spark: SparkSession,
    day_rollup_path: str,
    week_rollup_path: str,
    touched_dates: list[str],
) -> list[str]:
    """Cascade maintenance: recompute the week partitions covering
    ``touched_dates`` from the DAY rollup (never the fact), pruned to
    exactly those weeks' day partitions. Cost per interval =
    O(touched weeks × users), idempotent like the day flavor
    (recompute-and-replace of whole week partitions). Late data is
    closed by construction at this level too: the source is the
    committed day rollup, which `maintain_user_day_rollup` has already
    rewritten from full-day history."""
    import datetime as _dt

    def _week_of(iso: str) -> _dt.date:
        d = _dt.date.fromisoformat(iso)
        return d - _dt.timedelta(days=d.weekday())

    weeks = sorted({_week_of(d).isoformat() for d in touched_dates})
    if not weeks:
        return []
    # explicit day list (weeks × 7) so the day-rollup read prunes to
    # exactly the touched weeks' partition directories
    days = [
        (_dt.date.fromisoformat(w) + _dt.timedelta(days=i)).isoformat()
        for w in weeks
        for i in range(7)
    ]
    day_rollup = writers.read_table(spark, day_rollup_path).where(
        F.col("event_date").cast("string").isin(days)
    )
    week = user_week_rollup(day_rollup)
    writers.overwrite_partitions(week, week_rollup_path, ["week_start"])
    return weeks


def wau_from_week_rollup(week_rollup: DataFrame) -> DataFrame:
    """WAU served from the week-grain partials: distinct users per week
    over O(users×weeks) rows — the form that wins even when the
    day-grain compression is ~1× (uniform traffic)."""
    return week_rollup.groupBy(
        F.col("week_start").cast("string").alias("week_start")
    ).agg(F.countDistinct("user_id").alias("wau"))


def wau_segments_from_week_rollup(week_rollup: DataFrame) -> DataFrame:
    """The reference's ACTUAL `WAU.sql` shape (`sql_queries/WAU.sql`):
    the TOTAL / EVENT_TYPE / AB_GROUP weekly-unique stack plus the
    week-over-week growth ladder (prev_week_wau via LAG, 2-dp growth
    pct), served entirely from the week-grain partials.

    Exactness mirrors the DAU stack: (week, user, type) rows are
    unique, so the EVENT_TYPE distinct is COUNT(*); TOTAL / AB
    re-distinct user_id. year/week_number derive from week_start (one
    row per ISO week — the reference groups by the same triple). The
    growth pct uses the engine-wide floor form
    ``floor(x*100+0.5)/100`` — identical IEEE ops in both engines,
    unlike round() tie behavior."""
    from pyspark.sql import Window

    wk = F.col("week_start").cast("string").alias("week_start")
    total = (
        week_rollup.groupBy(wk)
        .agg(F.countDistinct("user_id").alias("wau"))
        .select(
            "week_start",
            F.lit("TOTAL").alias("segment_type"),
            F.lit("ALL").alias("segment_value"),
            "wau",
        )
    )
    by_type = (
        week_rollup.groupBy(wk, F.col("event_type").alias("segment_value"))
        .agg(F.count("*").alias("wau"))
        .select(
            "week_start",
            F.lit("EVENT_TYPE").alias("segment_type"),
            "segment_value",
            "wau",
        )
    )
    by_ab = (
        week_rollup.groupBy(wk, _ab_segment(F.col("user_id")).alias("segment_value"))
        .agg(F.countDistinct("user_id").alias("wau"))
        .select(
            "week_start",
            F.lit("AB_GROUP").alias("segment_type"),
            "segment_value",
            "wau",
        )
    )
    stacked = total.unionAll(by_type).unionAll(by_ab)
    w = Window.partitionBy("segment_type", "segment_value").orderBy("week_start")
    prev = F.lag("wau").over(w)
    growth = F.when(
        prev > 0,
        F.floor((F.col("wau") - prev) * 10000.0 / prev + F.lit(0.5)) / 100.0,
    )
    return stacked.select(
        "week_start",
        F.year(F.col("week_start").cast("date")).cast("int").alias("year"),
        F.weekofyear(F.col("week_start").cast("date")).cast("int").alias("week_number"),
        "segment_type",
        "segment_value",
        "wau",
        # DOUBLE, not nullable BIGINT: NULL-able int columns promote to
        # float in pandas on one side of the driver compare but not the
        # other ('150' vs '150.0') — emit float on BOTH engines.
        prev.cast("double").alias("prev_week_wau"),
        growth.alias("week_over_week_growth_pct"),
    )


# ------------------------------------------------------------------ Gold-side
# presence partials: the rollup tier for the reference's OWN dashboard
# SQL (sql_queries/DAU.sql / WAU.sql), which aggregates the Gold fact
# joined to dim_user's segment attributes. The partial keeps ONLY
# (date, user_dim_key) — the segment attributes deliberately stay OUT
# of the partial grain and join in at serving time from the CURRENT
# dim_user: dim_user is SCD1 (latest-wins upsert, pipeline/dims.py), so
# an attribute frozen into the partial at ingest time would go stale
# the moment a user's segment flips, while the reference's query shape
# re-joins the dim per query and always reflects the latest row.
# Serving therefore stays exactly equal to DAU.sql under dim churn
# WITHOUT any rollup rebuild, and remains fact-free: the plan reads the
# O(users×days) presence partial + the broadcast-sized dim — never
# fact_user_events (DAU.sql itself joins the same dim, so a dim scan is
# part of the reference shape, not a compromise).


def user_day_presence_rollup(fact: DataFrame, dim_time: DataFrame) -> DataFrame:
    """One row per (active_date, user_dim_key): the distinct user-day
    presence set of the Gold fact, dated through the same dim_time join
    DAU.sql uses (time_dim_key -> t.date) and pre-filtered to real
    users (user_dim_key != 0, the reference's WHERE). Uniqueness of the
    grain is what turns every serving distinct into a COUNT(*)."""
    return (
        fact.where(F.col("user_dim_key") != 0)
        .join(F.broadcast(dim_time), "time_dim_key")
        .select(F.col("date").alias("active_date"), "user_dim_key")
        .distinct()
    )


def maintain_user_day_presence_rollup(
    spark: SparkSession,
    fact: DataFrame,
    dim_time: DataFrame,
    rollup_path: str,
    *,
    touched_dates: list[str] | None = None,
) -> list[str]:
    """Incremental maintenance, same discipline as
    maintain_user_day_rollup: recompute the presence partitions for the
    dates present in ``fact`` (one batch / interval of the Gold fact —
    its ``event_date`` partition column names the touched days) and
    dynamic-partition-overwrite exactly those. Idempotent; cost is the
    touched days' fact partitions, never table size."""
    if touched_dates is None:
        touched_dates = [
            r["d"]
            for r in fact.select(
                F.col("event_date").cast("string").alias("d")
            )
            .distinct()
            .collect()
        ]
    if not touched_dates:
        return []
    source = fact.where(F.col("event_date").cast("string").isin(touched_dates))
    writers.overwrite_partitions(
        user_day_presence_rollup(source, dim_time), rollup_path, ["active_date"]
    )
    return touched_dates


def _coalesced_block(
    joined: DataFrame, key_names: list[str], stype: str, attr: str | None, metric: str
) -> DataFrame:
    """One UNION ALL block of the reference stack: COUNT(*) of unique
    user-grain presence rows per (period keys [, segment attr]).
    ``joined`` must already carry the period key columns by name."""
    sval = (
        F.lit("ALL")
        if attr is None
        else F.coalesce(F.col(attr), F.lit("UNKNOWN"))
    )
    return (
        joined.groupBy(*key_names, sval.alias("segment_value"))
        .agg(F.count("*").alias(metric))
        .select(
            *key_names,
            F.lit(stype).alias("segment_type"),
            "segment_value",
            metric,
        )
    )


def dau_segments_from_presence(presence: DataFrame, dim_user: DataFrame) -> DataFrame:
    """The reference's FULL 4-block `DAU.sql` stack — TOTAL /
    USER_SEGMENT / COOKING_STYLE / AB_TEST_GROUP daily uniques over the
    Gold fact + dim_user (`sql_queries/DAU.sql:1-52`) — served from the
    presence partials (VERDICT r10 #6).

    Exactness: presence is unique per (date, user); dim_user is SCD1-
    unique per user_sk (injectivity audited at build); each segment
    attribute is functionally dependent on the user — so EVERY block's
    COUNT(DISTINCT user_dim_key) is a plain COUNT(*) of joined partial
    rows. The inner join to dim_user reproduces DAU.sql's JOIN
    semantics (un-dimensioned users drop), and joining at serving time
    keeps results exact under SCD1 attribute churn (see module note).
    Oracled against pipeline/analytics.py `dau` in test_medallion.py;
    fact-free plan gate in tests/test_rollups.py."""
    u = F.broadcast(
        dim_user.select("user_sk", "user_segment", "cooking_style", "ab_test_group")
    )
    j = presence.join(u, presence["user_dim_key"] == u["user_sk"]).withColumn(
        "event_date", F.col("active_date").cast("string")
    )
    blocks = [
        _coalesced_block(j, ["event_date"], "TOTAL", None, "dau"),
        _coalesced_block(j, ["event_date"], "USER_SEGMENT", "user_segment", "dau"),
        _coalesced_block(j, ["event_date"], "COOKING_STYLE", "cooking_style", "dau"),
        _coalesced_block(j, ["event_date"], "AB_TEST_GROUP", "ab_test_group", "dau"),
    ]
    out = blocks[0]
    for b in blocks[1:]:
        out = out.unionAll(b)
    return out.select("event_date", "segment_type", "segment_value", "dau")


def user_week_presence_rollup(presence: DataFrame) -> DataFrame:
    """(week_start, year, week_number, user_dim_key) distinct partials
    cascaded from the day presence — the WAU.sql serving grain.
    year/week_number derive from the member DATE (not week_start)
    because the reference groups by year(t.date)/weekofyear(t.date),
    which can split a year-straddling week into two rows; keeping both
    columns in the grain reproduces that exactly. O(users×weeks×≤2)."""
    return presence.select(
        F.date_trunc("week", F.col("active_date")).cast("date").alias("week_start"),
        F.year("active_date").cast("int").alias("year"),
        F.weekofyear("active_date").cast("int").alias("week_number"),
        "user_dim_key",
    ).distinct()


def wau_segments_from_presence(week_presence: DataFrame, dim_user: DataFrame) -> DataFrame:
    """The reference's FULL `WAU.sql` stack — TOTAL / USER_SEGMENT /
    AB_TEST_GROUP weekly uniques plus the week-over-week LAG growth
    ladder — served from the week-grain presence partials. Same
    COUNT(*)-of-grain-rows exactness argument as the DAU stack; the
    growth pct uses ROUND(x, 2) half-up exactly as `analytics.wau`
    does (Spark-vs-Spark equivalence, pinned in test_medallion.py)."""
    from pyspark.sql import Window

    u = F.broadcast(dim_user.select("user_sk", "user_segment", "ab_test_group"))
    j = (
        week_presence.join(u, week_presence["user_dim_key"] == u["user_sk"])
        .withColumn("week_start", F.col("week_start").cast("string"))
    )
    wk = ["week_start", "year", "week_number"]
    blocks = [
        _coalesced_block(j, wk, "TOTAL", None, "wau"),
        _coalesced_block(j, wk, "USER_SEGMENT", "user_segment", "wau"),
        _coalesced_block(j, wk, "AB_TEST_GROUP", "ab_test_group", "wau"),
    ]
    stacked = blocks[0]
    for b in blocks[1:]:
        stacked = stacked.unionAll(b)
    # Order by the FULL grain: a year-straddling ISO week keeps two
    # rows per week_start (year/week_number come from the member date),
    # so week_start alone would make the LAG nondeterministic there
    # (ADVICE r12). Mirrored in the DuckDB oracle's WINDOW clause.
    w = Window.partitionBy("segment_type", "segment_value").orderBy(
        "week_start", "year", "week_number"
    )
    prev = F.lag("wau").over(w)
    growth = F.when(prev > 0, F.round((F.col("wau") - prev) * 100.0 / prev, 2))
    return stacked.select(
        "week_start",
        "year",
        "week_number",
        "segment_type",
        "segment_value",
        "wau",
        prev.alias("prev_week_wau"),
        growth.alias("week_over_week_growth_pct"),
    )


def daily_value_from_rollup(rollup: DataFrame) -> DataFrame:
    """Per-day/type event counts and exact value sums (2 dp via the
    floor form) — the engagement-score family, fact-free."""
    return rollup.groupBy(
        F.col("event_date").cast("string").alias("event_date"), "event_type"
    ).agg(
        F.sum("n_events").alias("event_count"),
        (
            F.floor(
                (F.sum("value_u") / F.lit(_VALUE_UNIT // 100)).cast("double") + 0.5
            ).cast("double")
            / 100.0
        ).alias("value_sum"),
    )
