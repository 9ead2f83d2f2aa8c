"""Event-sequence analytics: per-user event-type transition matrix.

The classic first-order Markov view of a clickstream: for every user,
order events by time and count (previous_type -> current_type)
transitions, then normalize rows into probabilities. One window pass
partitioned by user (the same shuffle key every per-user analytic in
plans/events.py uses) plus one small aggregation — no self-joins. At
100 TB the window partitions by user_id, so state per task is one
user's ordered slice; skewed power-users are bounded by session length,
not corpus size.

Ordering inside a user is (ts, event_id): ts alone can tie (multiple
events in the same microsecond), and an unspecified tiebreak would make
lag() nondeterministic across engines; event_id is unique so the order
is total.

Reference parity: no sequence analytics exist in the reference; this
extends the events-table surface (SURVEY.md §2.10 north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table


@register(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type,
               event_type AS curr_type
        FROM events
    ), counts AS (
        SELECT prev_type, curr_type, COUNT(*) AS n_transitions
        FROM seq
        WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT prev_type, curr_type, n_transitions,
           ROUND(5e-10 + n_transitions * 1.0 / SUM(n_transitions)
                 OVER (PARTITION BY prev_type),
                 4) AS p_transition
    FROM counts
    ORDER BY prev_type, curr_type
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences: lag() window keyed (user_id, ts, event_id), transition "
    "counts, and per-source-state probabilities via a second window "
    "over the tiny counts table. Only the lag() window shuffles the "
    "full events table; everything downstream operates on the "
    "|event_types|^2-row counts.",
)
def events_transition_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    seq = events.withColumn(
        "prev_type",
        F.lag("event_type").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ),
    )
    counts = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("curr_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    return counts.select(
        "prev_type",
        "curr_type",
        "n_transitions",
        biased_round(
            F.col("n_transitions")
            * 1.0
            / F.sum("n_transitions").over(
                Window.partitionBy("prev_type")
            )
        ).alias("p_transition"),
    ).orderBy("prev_type", "curr_type")


@register(
    "events_asof_next_view",
    oracle="""
        SELECT p.event_id, p.user_id, p.ts, v.ts AS next_view_ts
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
            ON p.user_id = v.user_id AND p.ts <= v.ts
        ORDER BY p.event_id
    """,
    doc="FORWARD as-of join: for each purchase, the first view at or "
    "after it by the same user — the 'what did they do next' twin of "
    "events_asof_purchase_view. Same union+window plan (one shuffle on "
    "user_id, linear scan per partition) with the frame mirrored to "
    "following rows; oracle = DuckDB ASOF JOIN with the inequality "
    "flipped.",
)
def events_asof_next_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("next_view_ts")
    )
    return (
        asof_join(
            purchases,
            views,
            on="user_id",
            left_ts="ts",
            right_ts="next_view_ts",
            right_payload=["next_view_ts"],
            suffix="",
            direction="forward",
        )
        .select("event_id", "user_id", "ts", "next_view_ts")
        .orderBy("event_id")
    )


@register(
    "events_second_order_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               LAG(event_type, 2) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS p2,
               LAG(event_type, 1) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS p1,
               event_type AS nxt
        FROM events
    ), counts AS (
        SELECT p2, p1, nxt, COUNT(*) AS n
        FROM seq
        WHERE p2 IS NOT NULL AND p1 IS NOT NULL
        GROUP BY 1, 2, 3
    )
    SELECT p2, p1, nxt, CAST(n AS BIGINT) AS n,
           ROUND(5e-10 + n * 1.0 /
                 SUM(n) OVER (PARTITION BY p2, p1), 4) AS p_next
    FROM counts
    ORDER BY p2, p1, nxt
    """,
    doc="Second-order Markov transitions over per-user event "
    "sequences — the context-length-2 next-event model next to the "
    "first-order events_transition_matrix (the sequence-modeling "
    "training-data shape: (context, next) pair statistics). Two lag() "
    "windows share ONE (user_id, ts, event_id) sort/shuffle; "
    "everything downstream operates on the <= |event_types|^3-row "
    "counts table, with per-context probabilities from a window over "
    "those counts.",
)
def events_second_order_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.lag("event_type", 2).over(w).alias("p2"),
        F.lag("event_type", 1).over(w).alias("p1"),
        F.col("event_type").alias("nxt"),
    ).filter(F.col("p2").isNotNull() & F.col("p1").isNotNull())
    counts = seq.groupBy("p2", "p1", "nxt").agg(
        F.count(F.lit(1)).alias("n")
    )
    wp = Window.partitionBy("p2", "p1")
    return counts.select(
        "p2",
        "p1",
        "nxt",
        F.col("n").cast("long").alias("n"),
        biased_round(F.col("n") / F.sum("n").over(wp)).alias(
            "p_next"
        ),
    ).orderBy("p2", "p1", "nxt")


# ---------------------------------------------------------------------------
# A/B experiment readout

_AB_SALT = "ab-v1"
_AB_Z = 1.96  # 95% normal quantile, fixed literal on both engines


@register(
    "events_ab_test",
    oracle=f"""
    WITH u AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'purchase'
                        AND value > 150.0
                   THEN 1 ELSE 0 END) AS conv,
               CASE WHEN ('0x' || substring(md5('{_AB_SALT}'
                    || CAST(user_id AS VARCHAR)), 1, 4))::BIGINT
                    < 32768 THEN 'A' ELSE 'B' END AS arm
        FROM events GROUP BY user_id
    ), arms AS (
        SELECT arm, COUNT(*) AS n,
               CAST(SUM(conv) AS BIGINT) AS conv
        FROM u GROUP BY arm
    ), wide AS (
        SELECT MAX(CASE WHEN arm = 'A' THEN n END) AS na,
               MAX(CASE WHEN arm = 'A' THEN conv END) AS ca,
               MAX(CASE WHEN arm = 'B' THEN n END) AS nb,
               MAX(CASE WHEN arm = 'B' THEN conv END) AS cb
        FROM arms
    ), zrow AS (
        SELECT ROUND(5e-10 +
               (ca * 1.0 / na - cb * 1.0 / nb)
               / SQRT(((ca + cb) * 1.0 / (na + nb))
                      * (1.0 - (ca + cb) * 1.0 / (na + nb))
                      * (1.0 / na + 1.0 / nb)), 4) AS z
        FROM wide
    )
    SELECT a.arm, CAST(a.n AS BIGINT) AS n_users, a.conv,
           ROUND(5e-10 + a.conv * 1.0 / a.n, 4) AS rate,
           ROUND(5e-10 +
                 ((a.conv * 1.0 / a.n + {_AB_Z} * {_AB_Z} / (2.0 * a.n))
                  - {_AB_Z} * SQRT((a.conv * 1.0 / a.n)
                        * (1.0 - a.conv * 1.0 / a.n) / a.n
                        + {_AB_Z} * {_AB_Z} / (4.0 * a.n * a.n)))
                 / (1.0 + {_AB_Z} * {_AB_Z} / a.n), 4) AS wilson_lo,
           ROUND(5e-10 +
                 ((a.conv * 1.0 / a.n + {_AB_Z} * {_AB_Z} / (2.0 * a.n))
                  + {_AB_Z} * SQRT((a.conv * 1.0 / a.n)
                        * (1.0 - a.conv * 1.0 / a.n) / a.n
                        + {_AB_Z} * {_AB_Z} / (4.0 * a.n * a.n)))
                 / (1.0 + {_AB_Z} * {_AB_Z} / a.n), 4) AS wilson_hi,
           z.z AS z_stat,
           ABS(z.z) > {_AB_Z} AS significant
    FROM arms a CROSS JOIN zrow z
    ORDER BY a.arm
    """,
    doc="A/B experiment readout: users split into arms by the md5 "
    "hash bucket (the training-split derandomization), conversion = "
    "a purchase with value > 150; per arm the Wilson 95% interval (the "
    "score interval — correct coverage at small n and extreme rates, "
    "unlike Wald), plus the pooled two-proportion z statistic and the "
    "5%-level call, which binds on the BIASED-ROUNDED z on both "
    "engines (rounded-gate rule). One groupBy(user) shuffle, then "
    "2-row arithmetic; every formula written with identical "
    "association on both engines (sqrt/abs are libm twins).",
)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hex4 = F.substring(
        F.md5(
            F.concat(F.lit(_AB_SALT), F.col("user_id").cast("string"))
        ),
        1,
        4,
    )
    arm = F.when(
        F.conv(hex4, 16, 10).cast("long") < 32768, "A"
    ).otherwise("B")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > 150.0),
                1,
            ).otherwise(0)
        ).alias("conv"),
        F.first(arm).alias("arm"),
    )
    # arm is a pure function of the grouping key, so first() is exact
    arms = u.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("conv").cast("long").alias("conv"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("arm") == "A", F.col("conv"))).alias("ca"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("arm") == "B", F.col("conv"))).alias("cb"),
    )
    na, ca, nb, cb = (
        F.col("na"),
        F.col("ca"),
        F.col("nb"),
        F.col("cb"),
    )
    pool = (ca + cb) * F.lit(1.0) / (na + nb)
    zrow = wide.select(
        biased_round(
            (ca * F.lit(1.0) / na - cb * F.lit(1.0) / nb)
            / F.sqrt(
                pool
                * (F.lit(1.0) - pool)
                * (F.lit(1.0) / na + F.lit(1.0) / nb)
            )
        ).alias("z")
    )
    zz = F.lit(_AB_Z) * F.lit(_AB_Z)
    p = F.col("conv") * F.lit(1.0) / F.col("n")
    n = F.col("n")
    center = p + zz / (F.lit(2.0) * n)
    half = F.lit(_AB_Z) * F.sqrt(
        p * (F.lit(1.0) - p) / n
        + zz / (F.lit(4.0) * n * n)
    )
    denom = F.lit(1.0) + zz / n
    return (
        arms.crossJoin(F.broadcast(zrow))
        .select(
            "arm",
            F.col("n").cast("long").alias("n_users"),
            "conv",
            biased_round(p).alias("rate"),
            biased_round((center - half) / denom).alias("wilson_lo"),
            biased_round((center + half) / denom).alias("wilson_hi"),
            F.col("z").alias("z_stat"),
            (F.abs(F.col("z")) > F.lit(_AB_Z)).alias("significant"),
        )
        .orderBy("arm")
    )


# ---------------------------------------------------------------------------
# Markov stationary distribution (r12)

_MSD_ITERS = 8

_MSD_ITER = """
    , p{k} AS (
        SELECT t.dst AS state, SUM(p.pi * t.pr ORDER BY t.src) AS pi
        FROM p{p} p JOIN tm t ON t.src = p.state
        GROUP BY t.dst
    )"""


@register(
    "events_markov_stationary",
    oracle=(
        """
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY ts, event_id) AS nxt
        FROM events
    ), cnt AS (
        SELECT event_type AS src, nxt AS dst, COUNT(*) AS c
        FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    ), tm AS (
        SELECT src, dst,
               c * 1.0 / SUM(c) OVER (PARTITION BY src) AS pr
        FROM cnt
    ), states AS (
        SELECT src AS state, COUNT(*) OVER () AS ns
        FROM (SELECT DISTINCT src FROM cnt)
    ), p0 AS (
        SELECT state, 1.0 / ns AS pi FROM states
    )"""
        + "".join(
            _MSD_ITER.format(k=k, p=k - 1)
            for k in range(1, _MSD_ITERS + 1)
        )
        + f"""
    SELECT state, ROUND(5e-10 + pi, 4) AS pi
    FROM p{_MSD_ITERS} ORDER BY state
    """
    ),
    doc=f"Stationary distribution of the first-order event Markov "
    f"chain by {_MSD_ITERS} derandomized power-iteration rounds from "
    "the uniform start: ONE user-partitioned lag window shuffles the "
    "events table (the transition-matrix shape); the iteration then "
    "runs DRIVER-side over the collected |types|^2-bounded matrix "
    "(the same bounded-collect class as the MMR greedy — 25 cells, "
    "never corpus-sized), each round's mass accumulating as a left "
    "fold in source-state order from 0.0 — exactly the oracle's "
    "ordered aggregates — so the iterated doubles stay "
    "engine-identical. "
    "The long-run fraction of time the event stream spends in each "
    "state — the steady-state the transition matrix only implies.",
)
def events_markov_stationary(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    cnt = seq.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("c")
    )
    wsrc = Window.partitionBy("src")
    tm = cnt.select(
        "src",
        "dst",
        (F.col("c") * F.lit(1.0) / F.sum("c").over(wsrc)).alias(
            "pr"
        ),
    ).localCheckpoint(eager=False)
    states = [
        r["src"]
        for r in tm.select("src").distinct().orderBy("src").collect()
    ]
    ns = len(states)
    # per-destination ordered fold: collect each dst's (src, pr) into a
    # src-sorted array ONCE, then every power-iteration round is a pure
    # in-row fold over that array with the current pi vector as a map
    # literal — the mass adds in src order, matching the oracle's
    # ordered aggregates.
    rows = tm.collect()  # |types|^2-bounded (the matrix itself)
    by_dst: dict = {}
    for r in rows:
        by_dst.setdefault(r["dst"], []).append((r["src"], r["pr"]))
    pi = {s: 1.0 / ns for s in states}
    for _ in range(_MSD_ITERS):
        nxt = {}
        for dst, ins in by_dst.items():
            acc = 0.0
            for src, pr in sorted(ins):
                acc = acc + pi[src] * pr
            nxt[dst] = acc
        pi = nxt
    out = spark.createDataFrame(
        [(s, float(pi[s])) for s in sorted(pi)], "state string, pi double"
    )
    return out.select(
        "state", biased_round(F.col("pi")).alias("pi")
    ).orderBy("state")


# ---------------------------------------------------------------------------
# RFM segmentation (r12)


@register(
    "agg_rfm_segments",
    oracle="""
    WITH base AS (
        SELECT o_custkey,
               MAX(o_orderdate) AS last_o,
               COUNT(*) AS f,
               SUM(o_totalprice) AS m_raw
        FROM orders GROUP BY o_custkey
    ), mx AS (SELECT MAX(last_o) AS maxd FROM base
    ), rfm AS (
        SELECT o_custkey,
               DATE_DIFF('day', last_o, mx.maxd) AS r,
               f,
               ROUND(5e-10 + m_raw, 4) AS m
        FROM base CROSS JOIN mx
    ), q AS (
        SELECT o_custkey, m,
               NTILE(4) OVER (ORDER BY r, o_custkey) AS rq,
               NTILE(4) OVER (ORDER BY f, o_custkey) AS fq,
               NTILE(4) OVER (ORDER BY m, o_custkey) AS mq
        FROM rfm
    )
    SELECT 'r' || CAST(rq AS VARCHAR) || 'f' || CAST(fq AS VARCHAR)
               || 'm' || CAST(mq AS VARCHAR) AS segment,
           COUNT(*) AS n_customers,
           ROUND(5e-10 + SUM(m) / COUNT(*), 4) AS avg_monetary
    FROM q GROUP BY 1 ORDER BY segment
    """,
    doc="RFM segmentation: per customer, Recency = days since last "
    "order (vs corpus max), Frequency = order count, Monetary = "
    "biased-rounded total spend (ROUNDED BEFORE ranking — the "
    "rounded-gate rule: quartile membership is a row-set decision); "
    "each dimension quartiled with the exact NTILE arithmetic of the "
    "TWO-PHASE global rank (operators/rank.py — boundary literals + "
    "bucket-partitioned windows, three ranks and zero single-task "
    "sorts over the customer-sized table; custkey tie-breaks), then "
    "segments labeled r#f#m# and aggregated. The classic marketing "
    "cube computed scale-safe.",
)
def agg_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators.rank import (
        ntile_from_row_number,
        with_global_row_number,
    )

    orders = load_table(spark, sf_dir, "orders")
    base = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_o"),
        F.count(F.lit(1)).alias("f"),
        F.sum("o_totalprice").alias("m_raw"),
    )
    mx = base.agg(F.max("last_o").alias("maxd"))
    rfm = base.crossJoin(F.broadcast(mx)).select(
        "o_custkey",
        F.datediff(
            F.to_date("maxd"), F.to_date("last_o")
        ).cast("long").alias("r"),
        "f",
        biased_round(F.col("m_raw")).alias("m"),
    ).localCheckpoint(eager=False)  # three rank passes consume it
    n_tot = rfm.count()
    ranked = rfm
    for dim, rn_col in (("r", "rq"), ("f", "fq"), ("m", "mq")):
        ranked = with_global_row_number(
            ranked, [dim, "o_custkey"], out=f"__rn_{dim}"
        ).withColumn(
            rn_col,
            ntile_from_row_number(
                F.col(f"__rn_{dim}"), F.lit(n_tot), 4
            ),
        )
    seg = F.concat(
        F.lit("r"), F.col("rq").cast("string"),
        F.lit("f"), F.col("fq").cast("string"),
        F.lit("m"), F.col("mq").cast("string"),
    )
    return (
        ranked.select(seg.alias("segment"), "m")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            biased_round(
                F.sum("m") / F.count(F.lit(1))
            ).alias("avg_monetary"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# CUPED variance reduction (r12)

_CUPED_SPLIT = "2024-01-16"  # pre-period < split <= post-period


@register(
    "events_cuped_adjusted",
    oracle=f"""
    WITH u AS (
        SELECT user_id,
               CASE WHEN ('0x' || substring(md5('ab-v1'
                    || CAST(user_id AS VARCHAR)), 1, 4))::BIGINT
                    < 32768 THEN 'A' ELSE 'B' END AS arm,
               SUM(CASE WHEN ts < TIMESTAMP '{_CUPED_SPLIT}'
                   THEN value ELSE 0 END) AS pre,
               SUM(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}'
                   THEN value ELSE 0 END) AS post
        FROM events GROUP BY user_id
    ), m AS (
        SELECT COUNT(*) * 1.0 AS n, SUM(pre) AS sp, SUM(post) AS sq,
               SUM(pre * pre) AS spp, SUM(pre * post) AS spq,
               SUM(post * post) AS sqq
        FROM u
    ), th AS (
        SELECT n, sp / n AS mp, sq,
               (spq / n - (sp / n) * (sq / n))
               / (spp / n - (sp / n) * (sp / n)) AS theta,
               sqq / n - (sq / n) * (sq / n) AS var_post,
               spq, spp
        FROM m
    ), adj AS (
        SELECT u.arm,
               u.post - th.theta * (u.pre - th.mp) AS y
        FROM u CROSS JOIN th
    ), am AS (
        SELECT arm, COUNT(*) AS n, SUM(y) AS sy, SUM(y * y) AS syy
        FROM adj GROUP BY arm
    ), wide AS (
        SELECT
          MAX(CASE WHEN arm = 'A' THEN n END) AS na,
          MAX(CASE WHEN arm = 'B' THEN n END) AS nb,
          MAX(CASE WHEN arm = 'A' THEN sy END) AS sya,
          MAX(CASE WHEN arm = 'B' THEN sy END) AS syb,
          SUM(sy) AS sy, SUM(syy) AS syy, SUM(n) AS n
        FROM am
    ), raw AS (
        SELECT arm, SUM(post) / COUNT(*) AS mpost
        FROM u GROUP BY arm
    ), raww AS (
        SELECT MAX(CASE WHEN arm = 'A' THEN mpost END) AS ma,
               MAX(CASE WHEN arm = 'B' THEN mpost END) AS mb
        FROM raw
    )
    SELECT CAST(w.na AS BIGINT) AS n_a, CAST(w.nb AS BIGINT) AS n_b,
           ROUND(5e-10 + r.ma - r.mb, 4) AS diff_raw,
           ROUND(5e-10 + w.sya / w.na - w.syb / w.nb, 4)
               AS diff_cuped,
           ROUND(5e-10 + t.theta, 4) AS theta,
           ROUND(5e-10 + 1.0 - (w.syy / w.n - (w.sy / w.n)
                 * (w.sy / w.n)) / t.var_post, 4) AS var_reduction
    FROM wide w CROSS JOIN th t CROSS JOIN raww r
    """,
    doc="CUPED variance reduction (Deng et al., WSDM 2013) for the "
    f"A/B experiment: per-user pre-period (before {_CUPED_SPLIT}) "
    "spend is the covariate, theta = cov(pre, post)/var(pre) pooled, "
    "adjusted y = post - theta (pre - mean_pre). Reports the raw and "
    "CUPED arm-mean differences, theta, and the achieved variance "
    "reduction 1 - var(y)/var(post) — the standard trick that makes "
    "small treatment effects detectable. Two corpus passes (per-user "
    "aggregation, then the adjusted-moment pass against one broadcast "
    "scalar row); every formula the identical closed form on both "
    "engines; no float row gates.",
)
def events_cuped_adjusted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hex4 = F.substring(
        F.md5(
            F.concat(F.lit("ab-v1"), F.col("user_id").cast("string"))
        ),
        1,
        4,
    )
    arm = F.when(
        F.conv(hex4, 16, 10).cast("long") < 32768, "A"
    ).otherwise("B")
    split = F.lit(_CUPED_SPLIT).cast("timestamp")
    u = ev.groupBy("user_id").agg(
        F.first(arm).alias("arm"),
        F.sum(
            F.when(F.col("ts") < split, F.col("value")).otherwise(0.0)
        ).alias("pre"),
        F.sum(
            F.when(F.col("ts") >= split, F.col("value")).otherwise(
                0.0
            )
        ).alias("post"),
    ).localCheckpoint(eager=False)  # moment pass + adjusted pass
    n = F.col("n")
    m = u.agg(
        (F.count(F.lit(1)) * 1.0).alias("n"),
        F.sum("pre").alias("sp"),
        F.sum("post").alias("sq"),
        F.sum(F.col("pre") * F.col("pre")).alias("spp"),
        F.sum(F.col("pre") * F.col("post")).alias("spq"),
        F.sum(F.col("post") * F.col("post")).alias("sqq"),
    )
    th = m.select(
        "n",
        (F.col("sp") / n).alias("mp"),
        (
            (F.col("spq") / n - (F.col("sp") / n) * (F.col("sq") / n))
            / (
                F.col("spp") / n
                - (F.col("sp") / n) * (F.col("sp") / n)
            )
        ).alias("theta"),
        (
            F.col("sqq") / n - (F.col("sq") / n) * (F.col("sq") / n)
        ).alias("var_post"),
    )
    adj = u.crossJoin(F.broadcast(th)).select(
        "arm",
        "post",
        (
            F.col("post")
            - F.col("theta") * (F.col("pre") - F.col("mp"))
        ).alias("y"),
    )
    am = adj.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum("post").alias("spost"),
    )
    isa = F.col("arm") == "A"
    wide = am.agg(
        F.max(F.when(isa, F.col("n"))).alias("na"),
        F.max(F.when(~isa, F.col("n"))).alias("nb"),
        F.max(F.when(isa, F.col("sy"))).alias("sya"),
        F.max(F.when(~isa, F.col("sy"))).alias("syb"),
        F.max(F.when(isa, F.col("spost"))).alias("spa"),
        F.max(F.when(~isa, F.col("spost"))).alias("spb"),
        F.sum("sy").alias("sy"),
        F.sum("syy").alias("syy"),
        F.sum("n").alias("ntot"),
    )
    ntot = F.col("ntot")
    return wide.crossJoin(F.broadcast(th)).select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        biased_round(
            F.col("spa") / F.col("na") - F.col("spb") / F.col("nb")
        ).alias("diff_raw"),
        biased_round(
            F.col("sya") / F.col("na") - F.col("syb") / F.col("nb")
        ).alias("diff_cuped"),
        biased_round(F.col("theta")).alias("theta"),
        biased_round(
            F.lit(1.0)
            - (
                F.col("syy") / ntot
                - (F.col("sy") / ntot) * (F.col("sy") / ntot)
            )
            / F.col("var_post")
        ).alias("var_reduction"),
    )


# ---------------------------------------------------------------------------
# Conversion attribution (r12)


@register(
    "events_attribution_touch",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id, ts, event_type, value,
               FIRST_VALUE(CASE WHEN event_type <> 'purchase'
                           THEN event_type END IGNORE NULLS) OVER w
                   AS first_touch,
               LAST_VALUE(CASE WHEN event_type <> 'purchase'
                          THEN event_type END IGNORE NULLS) OVER w
                   AS last_touch
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING)
    ), conv AS (
        SELECT COALESCE(first_touch, 'none') AS first_touch,
               COALESCE(last_touch, 'none') AS last_touch,
               value
        FROM seq WHERE event_type = 'purchase'
    ), tot AS (SELECT COUNT(*) AS n, SUM(value) AS rev FROM conv
    ), un AS (
        SELECT 'first_touch' AS model, first_touch AS channel,
               COUNT(*) AS conversions, SUM(value) AS revenue
        FROM conv GROUP BY 2
        UNION ALL
        SELECT 'last_touch', last_touch, COUNT(*), SUM(value)
        FROM conv GROUP BY 2
    )
    SELECT model, channel,
           CAST(conversions AS BIGINT) AS conversions,
           ROUND(5e-10 + revenue, 4) AS revenue,
           ROUND(5e-10 + conversions * 1.0
                 / (SELECT n FROM tot), 4) AS share
    FROM un ORDER BY model, channel
    """,
    doc="Conversion attribution, first- and last-touch: for every "
    "purchase, the user's first and most recent preceding "
    "NON-purchase event types (the classic marketing models). ONE "
    "user-partitioned window computes both touches in the same frame "
    "(FIRST/LAST_VALUE ... IGNORE NULLS over the strict-past rows — "
    "frame semantics identical on both engines, (ts, event_id) "
    "ordering deterministic); purchases with no prior event "
    "attribute to 'none'. Conversions and revenue per (model, "
    "channel) with shares — models x types bounded output.",
)
def events_attribution_touch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    nonp = F.when(
        F.col("event_type") != "purchase", F.col("event_type")
    )
    seq = ev.select(
        "event_type",
        "value",
        F.first(nonp, ignorenulls=True).over(w).alias("first_touch"),
        F.last(nonp, ignorenulls=True).over(w).alias("last_touch"),
    )
    conv = seq.filter(F.col("event_type") == "purchase").select(
        F.coalesce(F.col("first_touch"), F.lit("none")).alias(
            "first_touch"
        ),
        F.coalesce(F.col("last_touch"), F.lit("none")).alias(
            "last_touch"
        ),
        "value",
    ).localCheckpoint(eager=False)  # two model groupings + total
    tot = conv.agg(F.count(F.lit(1)).alias("n"))
    un = (
        conv.groupBy(F.col("first_touch").alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("conversions"),
            F.sum("value").alias("revenue"),
        )
        .select(F.lit("first_touch").alias("model"), "*")
        .unionByName(
            conv.groupBy(F.col("last_touch").alias("channel"))
            .agg(
                F.count(F.lit(1)).alias("conversions"),
                F.sum("value").alias("revenue"),
            )
            .select(F.lit("last_touch").alias("model"), "*")
        )
    )
    return (
        un.crossJoin(F.broadcast(tot))
        .select(
            "model",
            "channel",
            F.col("conversions").cast("long").alias("conversions"),
            biased_round(F.col("revenue")).alias("revenue"),
            biased_round(
                F.col("conversions") * F.lit(1.0) / F.col("n")
            ).alias("share"),
        )
        .orderBy("model", "channel")
    )
