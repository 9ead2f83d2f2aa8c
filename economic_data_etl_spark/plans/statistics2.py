"""Second statistics/analytics tranche — shuffle-minimal DataFrame
compositions, all value-checked against DuckDB:

- market-basket pair mining (co-partitioned orderkey self-join; pair
  output bounded by basket size, linear in the table, never quadratic);
- row-based EWMA smoothing (daily pre-agg, fixed lag-tap fan with
  per-row weight renormalization — no running power term to overflow);
- correlated LATERAL top-n (Catalyst decorrelates to WindowGroupLimit);
- ordered 3-step funnel (min-timestamp chaining, one row per user per
  step — no event-sequence explosion);
- rolling 7-day correlation (corr from windowed moments; Spark only
  exposes corr() as a group aggregate);
- inter-arrival gap statistics (sizes streaming watermarks and session
  gap thresholds);
- warehouse table census (column-less count-star scans — footer reads);
- Pearson chi-square and lang-source mutual information (joint counts
  once, window marginals over the tiny cell table);
- CDC keep-latest compaction (WindowGroupLimit map-side trim);
- equal-frequency decile binning (deterministic ntile);
- order-to-ship latency SLA percentiles (NTZ-safe timestampdiff);
- schema-evolution union (unionByName vs UNION ALL BY NAME);
- Gini revenue concentration (sorted-rank identity, customer-sized
  window only).

Reference parity: the reference (src/transform.py) has no statistical
surface; these extend the engine's analytics the way its economic time
series would be consumed downstream (smoothing, co-movement, funnels,
SLA reporting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import TABLES, load_table


def _r(col):
    return biased_round(col)


@register(
    "join_market_basket_pairs",
    oracle="""
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(COUNT(DISTINCT a.l_orderkey) AS BIGINT)
                   AS n_orders_together
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        ORDER BY n_orders_together DESC, part_a, part_b
        LIMIT 25
    """,
    doc="Market-basket co-occurrence: top part pairs by the number of "
    "DISTINCT orders containing both. Self-join on l_orderkey with an "
    "anti-symmetric partkey predicate (each unordered pair once per "
    "order, however many lines repeat a part); both sides shuffle "
    "on the same key so the join is co-partitioned, and pair counts "
    "combine map-side before the final top-k. Output bounded by "
    "basket-size choose 2 per order — linear in the table, not "
    "quadratic, at any scale.",
)
def join_market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("part_a"),
        F.col("b.l_partkey").alias("part_b"),
        F.col("a.l_orderkey").alias("l_orderkey"),
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.countDistinct("l_orderkey").alias("n_orders_together"))
        .orderBy(F.desc("n_orders_together"), "part_a", "part_b")
        .limit(25)
    )


# EWMA taps: weight (1-alpha)^k for the k-th most recent observed day,
# renormalized over the taps that exist at the head of each series.
_EWMA_ALPHA = 0.3
_EWMA_TAPS = 12


def _ewma_sql() -> str:
    num = " + ".join(
        f"COALESCE({(1 - _EWMA_ALPHA) ** k!r} * lag(day_value, {k}) OVER w, 0)"
        for k in range(_EWMA_TAPS)
    )
    den = " + ".join(
        f"CASE WHEN lag(day_value, {k}) OVER w IS NOT NULL"
        f" THEN {(1 - _EWMA_ALPHA) ** k!r} ELSE 0 END"
        for k in range(_EWMA_TAPS)
    )
    return f"""
        WITH daily AS (
            SELECT event_type,
                   CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
                   AVG(value) AS day_value
            FROM events
            WHERE value IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT event_type, day,
               ROUND(5e-10 + ({num}) / ({den}), 4) AS ewma_value
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day)
        ORDER BY event_type, day
    """


@register(
    "ts_ewma_smoothed",
    oracle=_ewma_sql(),
    doc="Row-based EWMA (alpha=0.3, 12 taps) of the daily mean value per "
    "event type. Daily pre-aggregation first (collapses the fact table "
    "before any window), then a fixed fan of lag() taps with per-row "
    "weight renormalization — numerically stable (no running power "
    "term to overflow) and exactly reproducible in ANSI SQL, unlike "
    "the recursive y[i] = a*x[i] + (1-a)*y[i-1] form.",
)
def ts_ewma_smoothed(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            "event_type", F.date_trunc("day", "ts").alias("day")
        )
        .agg(F.avg("value").alias("day_value"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    num = sum(
        (
            F.coalesce(
                F.lit((1 - _EWMA_ALPHA) ** k) * F.lag("day_value", k).over(w),
                F.lit(0.0),
            )
            for k in range(_EWMA_TAPS)
        ),
        F.lit(0.0),
    )
    den = sum(
        (
            F.when(
                F.lag("day_value", k).over(w).isNotNull(),
                F.lit((1 - _EWMA_ALPHA) ** k),
            ).otherwise(F.lit(0.0))
            for k in range(_EWMA_TAPS)
        ),
        F.lit(0.0),
    )
    return (
        daily.select(
            "event_type",
            "day",
            _r(num / den).alias("ewma_value"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "sql_lateral_topn_per_nation",
    oracle="""
        SELECT n.n_name, t.c_name,
               ROUND(5e-10 + t.c_acctbal, 4) AS acctbal
        FROM nation n, LATERAL (
            SELECT c_name, c_acctbal
            FROM customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_name
            LIMIT 2
        ) t
        ORDER BY n.n_name, acctbal DESC, t.c_name
    """,
    doc="Correlated LATERAL subquery with ORDER BY + LIMIT: top-2 "
    "customers by balance per nation, written as the SQL-standard "
    "lateral join. Catalyst decorrelates it into a ranked join "
    "(WindowGroupLimit under AQE), so the declarative form carries no "
    "penalty over a hand-written row_number filter.",
)
def sql_lateral_topn_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_name,
               ROUND(t.c_acctbal + 5e-10, 4) AS acctbal
        FROM nation n, LATERAL (
            SELECT c_name, c_acctbal
            FROM customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_name
            LIMIT 2
        ) t
        ORDER BY n.n_name, acctbal DESC, t.c_name
        """
    )


@register(
    "events_funnel_three_step",
    oracle="""
        WITH s1 AS (
            SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = 'signup' GROUP BY 1
        ), s2 AS (
            SELECT e.user_id, MIN(e.ts) AS t2
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'view' AND e.ts > s1.t1
            GROUP BY 1
        ), s3 AS (
            SELECT e.user_id, MIN(e.ts) AS t3
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s2.t2
            GROUP BY 1
        )
        SELECT COUNT(*) AS n_signup,
               CAST(COUNT(t2) AS BIGINT) AS n_viewed_after,
               CAST(COUNT(t3) AS BIGINT) AS n_purchased_after
        FROM s1
        LEFT JOIN s2 USING (user_id)
        LEFT JOIN s3 USING (user_id)
    """,
    doc="Ordered 3-step funnel (signup -> view -> purchase, strictly "
    "increasing event times) by min-timestamp chaining: each step is a "
    "keyed MIN over the events of users who reached the previous step. "
    "Three aggregations + user_id-keyed joins — no per-user event "
    "sequence materialization, so state is one row per user per step "
    "at any scale.",
)
def events_funnel_three_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .agg(
            F.count(F.lit(1)).alias("n_signup"),
            F.count("t2").alias("n_viewed_after"),
            F.count("t3").alias("n_purchased_after"),
        )
    )


_ROLL_W = 7


@register(
    "ts_rolling_correlation",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
                   SUM(CASE WHEN event_type = 'purchase' THEN value END)
                       AS x,
                   SUM(CASE WHEN event_type = 'view' THEN value END) AS y
            FROM events
            WHERE value IS NOT NULL
            GROUP BY 1
            HAVING x IS NOT NULL AND y IS NOT NULL
        )
        SELECT day,
               ROUND(5e-10 + x, 4) AS x_total,
               ROUND(5e-10 + y, 4) AS y_total,
               CASE WHEN COUNT(*) OVER w = {_ROLL_W}
                    THEN ROUND(5e-10 +
                        (AVG(x * y) OVER w - AVG(x) OVER w * AVG(y) OVER w)
                        / NULLIF(STDDEV_POP(x) OVER w
                                 * STDDEV_POP(y) OVER w, 0), 4)
               END AS roll_corr
        FROM daily
        WINDOW w AS (ORDER BY day
                     ROWS BETWEEN {_ROLL_W - 1} PRECEDING AND CURRENT ROW)
        ORDER BY day
    """,
    doc=f"Rolling {_ROLL_W}-day correlation between daily purchase and "
    "view value totals: conditional-aggregation pivot to two aligned "
    "series, then corr from windowed moments "
    "(E[xy] - E[x]E[y]) / (sigma_x * sigma_y) — Spark exposes corr() "
    "only as a group aggregate, so the moment composition IS the "
    "rolling form, identical in both engines. Emitted only for full "
    "windows; zero-variance windows yield null via NULLIF. One daily "
    "pre-aggregation shuffle; the single ordered window over days is "
    "one tiny partition per series at any corpus scale.",
)
def ts_rolling_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value"))
            ).alias("x"),
            F.sum(
                F.when(F.col("event_type") == "view", F.col("value"))
            ).alias("y"),
        )
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    )
    w = Window.orderBy("day").rowsBetween(-(_ROLL_W - 1), 0)
    corr = (
        F.avg(F.col("x") * F.col("y")).over(w)
        - F.avg("x").over(w) * F.avg("y").over(w)
    ) / F.nullif(
        F.stddev_pop("x").over(w) * F.stddev_pop("y").over(w), F.lit(0.0)
    )
    return (
        daily.select(
            "day",
            _r(F.col("x")).alias("x_total"),
            _r(F.col("y")).alias("y_total"),
            F.when(
                F.count(F.lit(1)).over(w) == _ROLL_W, _r(corr)
            ).alias("roll_corr"),
        )
        .orderBy("day")
    )


@register(
    "ts_interarrival_gaps",
    oracle="""
        WITH gaps AS (
            SELECT event_type,
                   EPOCH(ts - LAG(ts) OVER (
                       PARTITION BY event_type ORDER BY ts, event_id
                   )) AS gap_s
            FROM events
        )
        SELECT event_type,
               CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
               ROUND(5e-10 + AVG(gap_s), 4) AS mean_gap_s,
               ROUND(5e-10 + quantile_cont(gap_s, 0.5), 4) AS median_gap_s,
               ROUND(5e-10 + quantile_cont(gap_s, 0.9), 4) AS p90_gap_s,
               ROUND(5e-10 + MAX(gap_s), 4) AS max_gap_s
        FROM gaps
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="Point-process view of the event stream: inter-arrival gap "
    "statistics (mean / exact median / p90 / max seconds) per event "
    "type. One lag window per type (ordered by ts with event_id as the "
    "deterministic tiebreak) feeding one grouped aggregation — the "
    "arrival-rate profile that sizes streaming watermarks and session "
    "gap thresholds. Gap arithmetic goes through the NTZ-safe "
    "timestampdiff helper (Spark 4.1 forbids timestamp->double casts).",
)
def ts_interarrival_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.functions.casts import ts_diff_seconds

    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            ts_diff_seconds(F.lag("ts").over(w), F.col("ts")).alias(
                "gap_s"
            ),
        )
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("gap_s").alias("n_gaps"),
            _r(F.avg("gap_s")).alias("mean_gap_s"),
            _r(F.expr("percentile(gap_s, 0.5)")).alias("median_gap_s"),
            _r(F.expr("percentile(gap_s, 0.9)")).alias("p90_gap_s"),
            _r(F.max("gap_s")).alias("max_gap_s"),
        )
        .orderBy("event_type")
    )


@register(
    "profile_table_counts",
    # Oracle legs generated from the SAME TABLES tuple the Spark side
    # iterates — adding a table to the catalog cannot desynchronize the
    # two sides (round-3 advice).
    oracle=f"SELECT '{TABLES[0]}' AS table_name, COUNT(*) AS n_rows"
    f" FROM {TABLES[0]} "
    + " ".join(
        f"UNION ALL SELECT '{t}', COUNT(*) FROM {t}" for t in TABLES[1:]
    )
    + " ORDER BY table_name",
    doc="Warehouse census: one row count per catalog table via a UNION "
    "ALL of count-star aggregates. Each leg is a metadata-cheap "
    "column-less scan (parquet row-group counts; no column IO), so the "
    "audit costs footer reads, not data reads, at any scale.",
)
def profile_table_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    from economic_data_etl_spark.sources.tables import TABLES

    legs = [
        load_table(spark, sf_dir, t).agg(
            F.count(F.lit(1)).alias("n_rows")
        ).select(F.lit(t).alias("table_name"), "n_rows")
        for t in TABLES
    ]
    return reduce(lambda a, b: a.unionByName(b), legs).orderBy("table_name")


@register(
    "agg_chisq_priority_returnflag",
    oracle="""
        WITH joint AS (
            SELECT o.o_orderpriority AS p, l.l_returnflag AS m,
                   COUNT(*) * 1.0 AS obs
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY 1, 2
        ), tot AS (
            SELECT SUM(obs) AS n FROM joint
        ), marg AS (
            SELECT j.p, j.m, j.obs,
                   SUM(j.obs) OVER (PARTITION BY j.p) AS row_tot,
                   SUM(j.obs) OVER (PARTITION BY j.m) AS col_tot
            FROM joint j
        )
        SELECT ROUND(5e-10 + SUM(
                   POW(obs - row_tot * col_tot / tot.n, 2)
                   / (row_tot * col_tot / tot.n)), 4) AS chi2,
               CAST((COUNT(DISTINCT p) - 1) * (COUNT(DISTINCT m) - 1)
                    AS BIGINT) AS dof,
               CAST(tot.n AS BIGINT) AS n_obs
        FROM marg CROSS JOIN tot
        GROUP BY tot.n
    """,
    doc="Chi-square test of independence between order priority and return "
    "flag: contingency counts from one fact join, marginals recovered "
    "with two window sums OVER THE TINY CONTINGENCY TABLE (5x3 cells) "
    "— the fact tables aggregate once and never move again, so the "
    "statistic costs one co-keyed join + one groupBy at any scale. "
    "Expected counts are row_tot*col_tot/n per Pearson's formula.",
)
def agg_chisq_priority_returnflag(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderpriority").alias("p")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.col("l_returnflag").alias("m"),
    )
    joint = (
        orders.join(li, "o_orderkey")
        .groupBy("p", "m")
        .agg(F.count(F.lit(1)).cast("double").alias("obs"))
    )
    wp = Window.partitionBy("p")
    wm = Window.partitionBy("m")
    marg = joint.select(
        "p",
        "m",
        "obs",
        F.sum("obs").over(wp).alias("row_tot"),
        F.sum("obs").over(wm).alias("col_tot"),
    )
    tot = joint.agg(F.sum("obs").alias("n"))
    exp = F.col("row_tot") * F.col("col_tot") / F.col("n")
    return (
        marg.crossJoin(F.broadcast(tot))
        .groupBy("n")
        .agg(
            _r(F.sum(F.pow(F.col("obs") - exp, 2) / exp)).alias("chi2"),
            (
                (F.countDistinct("p") - 1) * (F.countDistinct("m") - 1)
            ).alias("dof"),
        )
        .select(
            "chi2",
            "dof",
            F.col("n").cast("long").alias("n_obs"),
        )
    )


@register(
    "ts_trend_regression",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
                   SUM(value) AS day_total
            FROM events
            WHERE value IS NOT NULL
            GROUP BY 1, 2
        ), indexed AS (
            SELECT event_type, day_total,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type ORDER BY day
                   ) * 1.0 AS x
            FROM daily
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               ROUND(5e-10 + regr_slope(day_total, x), 4) AS slope,
               ROUND(5e-10 + regr_intercept(day_total, x), 4)
                   AS intercept,
               ROUND(5e-10 + regr_r2(day_total, x), 4) AS r2
        FROM indexed
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="Per-series linear trend: OLS slope/intercept/R² of the daily "
    "value total against the day index, via the SQL-standard regr_* "
    "aggregates (closed-form moments — single-pass, map-side "
    "combinable, no iteration). Day indices come from one row_number "
    "window over the tiny daily aggregate, so the fact table shuffles "
    "once for the pre-aggregation and the regression itself moves "
    "only per-series moment tuples.",
)
def ts_trend_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.sum("value").alias("day_total"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    indexed = daily.select(
        "event_type",
        "day_total",
        F.row_number().over(w).cast("double").alias("x"),
    )
    return (
        indexed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            _r(F.regr_slope("day_total", "x")).alias("slope"),
            _r(F.regr_intercept("day_total", "x")).alias("intercept"),
            _r(F.regr_r2("day_total", "x")).alias("r2"),
        )
        .orderBy("event_type")
    )


@register(
    "dedup_keep_latest_per_user",
    oracle="""
        SELECT user_id, event_id AS latest_event_id,
               ts AS latest_ts, event_type AS latest_type
        FROM (
            SELECT user_id, event_id, ts, event_type,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        )
        WHERE rn = 1
        ORDER BY user_id
    """,
    doc="CDC-style log compaction: keep only the latest event per user "
    "(ts desc, event_id desc as the total tiebreak). row_number-desc + "
    "rn=1 compiles to WindowGroupLimit, so each map task pre-trims to "
    "one row per key it holds BEFORE the shuffle — the pattern that "
    "compacts a 100 TB changelog while moving only the surviving "
    "rows' keys twice, never the full log.",
)
def dedup_keep_latest_per_user(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            "ts",
            "event_type",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.col("ts").alias("latest_ts"),
            F.col("event_type").alias("latest_type"),
        )
        .orderBy("user_id")
    )


@register(
    "features_decile_bins",
    oracle="""
        WITH binned AS (
            SELECT o_totalprice,
                   NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey)
                       AS decile
            FROM orders
        )
        SELECT CAST(decile AS BIGINT) AS decile,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(5e-10 + MIN(o_totalprice), 4) AS lo,
               ROUND(5e-10 + MAX(o_totalprice), 4) AS hi,
               ROUND(5e-10 + AVG(o_totalprice), 4) AS mean_price
        FROM binned
        GROUP BY decile
        ORDER BY decile
    """,
    doc="Equal-frequency discretization: decile bins of order value with "
    "per-bin edges and means — the fit step of a quantile binner "
    "(feature engineering) and a monotone binning for score "
    "calibration. ntile needs a total order; o_orderkey breaks "
    "o_totalprice ties so bin membership is deterministic in both "
    "engines. EXACT and DISTRIBUTED: the global row number comes from "
    "the two-phase rank (operators/rank.py — collected approx-quantile "
    "boundary literals bucket every row by pure projection, then rank "
    "= literal cumulative offset + row_number partitioned by bucket; "
    "the orders fact table never funnels through one task), and "
    "NTILE's base/remainder bucket arithmetic is replayed in closed "
    "form from (rn, n). The oracle keeps DuckDB's plain NTILE window.",
)
def features_decile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators.rank import (
        ntile_from_row_number,
        with_global_row_number,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderkey"
    )
    ranked = with_global_row_number(
        orders, ["o_totalprice", "o_orderkey"], out="rn"
    )
    # 1-row count from a plain second scan of the source (scan-only
    # lineage — no extra shuffle, and it keeps the ranked exchange
    # single-consumer-per-branch for ReuseExchange).
    n1 = orders.agg(F.count(F.lit(1)).alias("__n"))
    return (
        ranked.crossJoin(F.broadcast(n1))
        .select(
            "o_totalprice",
            ntile_from_row_number(
                F.col("rn"), F.col("__n"), 10
            ).alias("decile"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _r(F.min("o_totalprice")).alias("lo"),
            _r(F.max("o_totalprice")).alias("hi"),
            _r(F.avg("o_totalprice")).alias("mean_price"),
        )
        .select(F.col("decile").cast("long").alias("decile"), "n_orders", "lo", "hi", "mean_price")
        .orderBy("decile")
    )


@register(
    "agg_ship_latency_percentiles",
    oracle="""
        WITH lat AS (
            SELECT o.o_orderpriority,
                   CAST(DATE_DIFF('day', o.o_orderdate, l.l_shipdate)
                        AS DOUBLE) AS lag_days
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        )
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               ROUND(5e-10 + quantile_cont(lag_days, 0.5), 4) AS p50_days,
               ROUND(5e-10 + quantile_cont(lag_days, 0.9), 4) AS p90_days,
               ROUND(5e-10 + quantile_cont(lag_days, 0.99), 4) AS p99_days,
               ROUND(5e-10 + MAX(lag_days), 4) AS max_days
        FROM lat
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc="Order-to-ship latency percentiles (exact p50/p90/p99) per "
    "priority class — the SLA question every fulfillment pipeline "
    "asks. One co-keyed fact join + one grouped exact-percentile "
    "aggregation; the day lag uses timestampdiff (NTZ-safe under "
    "Spark 4.1 — never a timestamp cast), mirrored by DuckDB "
    "date_diff, both counting whole-day boundaries.",
)
def agg_ship_latency_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_shipdate"
    )
    lat = orders.join(li, "o_orderkey").select(
        "o_orderpriority",
        F.expr(
            "timestampdiff(DAY, o_orderdate, l_shipdate)"
        ).cast("double").alias("lag_days"),
    )
    return (
        lat.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            _r(F.expr("percentile(lag_days, 0.5)")).alias("p50_days"),
            _r(F.expr("percentile(lag_days, 0.9)")).alias("p90_days"),
            _r(F.expr("percentile(lag_days, 0.99)")).alias("p99_days"),
            _r(F.max("lag_days")).alias("max_days"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_mutual_information_lang_source",
    oracle="""
        WITH joint AS (
            SELECT lang, source, COUNT(*) AS c
            FROM documents GROUP BY 1, 2
        ), tot AS (
            SELECT SUM(c) AS n FROM joint
        ), marg AS (
            SELECT j.lang, j.source, j.c,
                   SUM(j.c) OVER (PARTITION BY j.lang) AS c_lang,
                   SUM(j.c) OVER (PARTITION BY j.source) AS c_source
            FROM joint j
        )
        SELECT ROUND(5e-10 + SUM(
                   (c * 1.0 / tot.n)
                   * LN((c * 1.0 / tot.n)
                        / ((c_lang * 1.0 / tot.n)
                           * (c_source * 1.0 / tot.n)))), 4) AS mi_nats,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(tot.n AS BIGINT) AS n_docs
        FROM marg CROSS JOIN tot
        GROUP BY tot.n
    """,
    doc="Mutual information (nats) between document language and source "
    "— the information-theoretic twin of the chi-square test: how much "
    "knowing the source tells you about the language (0 = independent; "
    "a high value means per-source language skew a mixture sampler "
    "must correct for). One grouped count over the corpus; marginals "
    "via window sums over the TINY joint table (|langs| x |sources| "
    "cells), which never re-touches the fact scan.",
)
def agg_mutual_information_lang_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    joint = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    marg = joint.select(
        "c",
        F.sum("c").over(Window.partitionBy("lang")).alias("c_lang"),
        F.sum("c").over(Window.partitionBy("source")).alias("c_source"),
    )
    tot = joint.agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    mi_term = p * F.log(
        p / ((F.col("c_lang") / F.col("n")) * (F.col("c_source") / F.col("n")))
    )
    return (
        marg.crossJoin(F.broadcast(tot))
        .groupBy("n")
        .agg(
            _r(F.sum(mi_term)).alias("mi_nats"),
            F.count(F.lit(1)).alias("n_cells"),
        )
        .select(
            "mi_nats",
            "n_cells",
            F.col("n").cast("long").alias("n_docs"),
        )
    )


@register(
    "union_schema_evolution",
    oracle="""
        SELECT o_orderkey, o_totalprice, o_orderpriority, o_orderstatus
        FROM (
            SELECT o_orderkey, o_totalprice, o_orderpriority,
                   NULL AS o_orderstatus
            FROM orders WHERE o_orderkey % 3 = 0
            UNION ALL BY NAME
            SELECT o_orderkey, o_totalprice, o_orderstatus
            FROM orders WHERE o_orderkey % 3 = 1
        )
        ORDER BY o_orderkey
    """,
    doc="Schema-evolution union: two projections of the same table with "
    "different column sets combine by NAME (missing columns null-fill) "
    "— Spark unionByName(allowMissingColumns=True) vs DuckDB UNION ALL "
    "BY NAME. The shape every multi-epoch data lake hits when an old "
    "partition predates a new column; position-based UNION would "
    "silently misalign. Pure map-side concatenation, no shuffle "
    "beyond the output sort.",
)
def union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    old_epoch = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    new_epoch = orders.filter(F.col("o_orderkey") % 3 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    return (
        old_epoch.unionByName(new_epoch, allowMissingColumns=True)
        .select(
            "o_orderkey", "o_totalprice", "o_orderpriority", "o_orderstatus"
        )
        .orderBy("o_orderkey")
    )


@register(
    "agg_gini_revenue_concentration",
    oracle="""
        WITH cust AS (
            SELECT o_custkey, SUM(o_totalprice) AS rev
            FROM orders GROUP BY 1
        ), ranked AS (
            SELECT rev,
                   ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS i,
                   COUNT(*) OVER () AS n,
                   SUM(rev) OVER () AS total
            FROM cust
        )
        SELECT CAST(ANY_VALUE(n) AS BIGINT) AS n_customers,
               ROUND(5e-10 + 2.0 * SUM(i * rev)
                     / (ANY_VALUE(n) * ANY_VALUE(total))
                     - (ANY_VALUE(n) + 1.0) / ANY_VALUE(n), 4) AS gini
        FROM ranked
    """,
    doc="Gini coefficient of revenue concentration across customers "
    "(0 = equal, 1 = winner-take-all) via the sorted-rank identity "
    "G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n — the same inequality "
    "measure data-curation pipelines apply to tokens-per-source. The "
    "fact table collapses to one row per customer first; the rank is "
    "the DISTRIBUTED two-phase rank (operators/rank.py — boundary-"
    "literal buckets + partitioned window), so even a billion-customer "
    "table never funnels through one task, and n / total(rev) fold "
    "into the same single-row final aggregate instead of unpartitioned "
    "COUNT()/SUM() OVER () windows. Ties in revenue "
    "rank deterministically by o_custkey (the identity is "
    "tie-order-invariant, the determinism is for the hash compare).",
)
def agg_gini_revenue_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from economic_data_etl_spark.operators.rank import (
        with_global_row_number,
    )

    cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    ranked = with_global_row_number(cust, ["rev", "o_custkey"], out="i")
    n = F.count(F.lit(1)).cast("double")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        _r(
            F.lit(2.0) * F.sum(F.col("i") * F.col("rev"))
            / (n * F.sum("rev"))
            - (n + F.lit(1.0)) / n
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Robust aggregates: trimmed mean (r12)

_TRIM_FRAC = 0.1


@register(
    "agg_trimmed_mean",
    oracle=f"""
    WITH rk AS (
        SELECT o_orderpriority, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice, o_orderkey) AS rn,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders
    ), cut AS (
        SELECT *, CAST(FLOOR({_TRIM_FRAC} * n) AS BIGINT) AS k
        FROM rk
    )
    SELECT o_orderpriority,
           CAST(MAX(n) AS BIGINT) AS n_orders,
           CAST(MAX(k) AS BIGINT) AS n_trimmed_each_side,
           ROUND(5e-10 + SUM(o_totalprice) / MAX(n), 4) AS mean,
           ROUND(5e-10 + SUM(CASE WHEN rn > k AND rn <= n - k
                                  THEN o_totalprice ELSE 0 END)
                 / (MAX(n) - 2 * MAX(k)), 4) AS trimmed_mean
    FROM cut GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc=f"Two-sided {_TRIM_FRAC:.0%} trimmed mean of order totals per "
    "priority next to the raw mean — the robust location estimate "
    "(resistant to the heavy right tail the raw mean chases). The "
    "trim cut is RANK-based with an (value, orderkey) tie-break, so "
    "the trimmed SET is deterministic on both engines (a pure "
    "value-threshold trim would be ambiguous at duplicated boundary "
    "values); k = floor(frac*n) is integer arithmetic. One "
    "group-partitioned rank window over orders (the standard "
    "partitioned shape — never a global sort), then a single "
    "aggregation.",
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    wp = Window.partitionBy("o_orderpriority")
    rk = orders.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number()
        .over(wp.orderBy("o_totalprice", "o_orderkey"))
        .alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    ).withColumn(
        "k", F.floor(F.lit(_TRIM_FRAC) * F.col("n")).cast("long")
    )
    kept = (F.col("rn") > F.col("k")) & (
        F.col("rn") <= F.col("n") - F.col("k")
    )
    return (
        rk.groupBy("o_orderpriority")
        .agg(
            F.max("n").cast("long").alias("n_orders"),
            F.max("k").cast("long").alias("n_trimmed_each_side"),
            biased_round(
                F.sum("o_totalprice") / F.max("n")
            ).alias("mean"),
            biased_round(
                F.sum(
                    F.when(kept, F.col("o_totalprice")).otherwise(0)
                )
                / (F.max("n") - 2 * F.max("k"))
            ).alias("trimmed_mean"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Zipf rank-frequency fit (r12)


@register(
    "text_zipf_fit",
    oracle="""
    WITH toks AS (
        SELECT list_filter(string_split_regex(lower(text),
                   '[ \\t\\n\\r]+'), x -> x <> '') AS w
        FROM documents
    ), ucnt AS (
        SELECT t, COUNT(*) AS c
        FROM (SELECT unnest(w) AS t FROM toks) GROUP BY t
    ), rk AS (
        SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, t) AS r
        FROM ucnt
    ), pts AS (
        SELECT LN(CAST(r AS DOUBLE)) AS x, LN(CAST(c AS DOUBLE)) AS y
        FROM rk
    ), m AS (
        SELECT COUNT(*) * 1.0 AS n,
               SUM(x ORDER BY x) AS sx, SUM(y ORDER BY x) AS sy,
               SUM(x * x ORDER BY x) AS sxx,
               SUM(x * y ORDER BY x) AS sxy,
               SUM(y * y ORDER BY x) AS syy
        FROM pts
    )
    SELECT CAST(n AS BIGINT) AS vocab,
           ROUND(5e-10 + (n * sxy - sx * sy)
                 / (n * sxx - sx * sx), 4) AS slope,
           ROUND(5e-10 + (sy - (n * sxy - sx * sy)
                 / (n * sxx - sx * sx) * sx) / n, 4) AS intercept,
           ROUND(5e-10 + (n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
                 4) AS r2
    FROM m
    """,
    doc="Zipf rank-frequency fit: OLS of ln(count) on ln(rank) over "
    "the vocabulary table (slope near -1 is Zipf's law; r2 measures "
    "fit). One corpus shuffle builds the vocab counts; the rank "
    "window and moment sums run over the VOCAB-bounded table (the "
    "Zipf-bounded exception of the unigram-tokenizer lane); the "
    "moment sums are engine-order float adds (the accepted repo-wide "
    "exposure — no row gates, outputs rounded), the rank tie-break "
    "binds on the token string.",
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.functions.text import WORD_SPLIT_RE

    docs = load_table(spark, sf_dir, "documents")
    ucnt = (
        docs.select(F.lower(F.col("text")).alias("lt"))
        .select(
            F.explode(
                F.filter(
                    F.split(F.col("lt"), WORD_SPLIT_RE),
                    lambda t: t != "",
                )
            ).alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rk = ucnt.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.desc("c"), F.asc("t")))
        .alias("r"),
    )
    pts = rk.select(
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    m = pts.agg(
        (F.count(F.lit(1)) * 1.0).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        n.cast("long").alias("vocab"),
        biased_round(slope).alias("slope"),
        biased_round((sy - slope * sx) / n).alias("intercept"),
        biased_round(
            (n * sxy - sx * sy)
            * (n * sxy - sx * sy)
            / ((n * sxx - sx * sx) * (n * syy - sy * sy))
        ).alias("r2"),
    )
