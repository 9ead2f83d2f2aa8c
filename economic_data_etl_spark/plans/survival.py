"""Kaplan-Meier survival estimation of user return times.

The product-limit estimator (Kaplan & Meier 1958) — retention
analysis in its standard statistical form. The spell under study is
the RETURN GAP: for every event, the hours until that user's next
event; the user "returns" (the death event, d) when a next event
exists, and the final gap of every user is right-CENSORED at the
corpus end (c) — the observation window closed before they came back.
The survival curve multiplies, over gap lengths t in order,

    S(t) = prod_{u <= t, d_u > 0} (1 - d_u / n_u)

where the risk set n_u counts gaps still open at length u. S(t) is
the probability a user stays away MORE than t hours — the
censoring-correct version of a return-time histogram (a naive
histogram of closed gaps biases short: long absences are exactly the
ones the window truncates).

Scale shape: gap extraction is ONE user-partitioned window (the
sessionize shape) over events; the gap-length histogram is then
hours-bounded, and every KM quantity — reverse-cumulative risk sets,
the log-space cumulative product — is a window over that bounded
table (the documented series exception, like CUSUM/Holt-Winters).

Cross-engine numerics: gap hours floor a µs-exact epoch difference
(functions/casts.py:ts_diff_seconds vs DuckDB epoch()); everything is
integer until the survival product, which is EXP of the ORDERED
cumulative sum of LN((n-d)/n) on both engines (identical libm calls
in identical t-order), with the d == n extinction row (LN(0)
diverges: NULL on Spark, -inf in DuckDB) special-cased to exact 0.0
from that row on. Output floats are biased-rounded; the only row
gates are integer.

Reference parity: none (the reference has no statistics); extends the
events lane next to events_user_retention (calendar cohort counts)
with the censoring-correct estimator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table

_KM_ORACLE = """
    WITH ev AS (
        SELECT user_id, event_id, ts FROM events
    ), mx AS (SELECT MAX(ts) AS max_ts FROM ev
    ), gaps AS (
        SELECT CAST(FLOOR((epoch(COALESCE(LEAD(ts) OVER w, mx.max_ts))
                           - epoch(ts)) / 3600) AS BIGINT) AS t,
               CASE WHEN LEAD(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS cens
        FROM ev CROSS JOIN mx
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), lif AS (SELECT * FROM gaps
    ), hist AS (
        SELECT t,
               CAST(SUM(1 - cens) AS BIGINT) AS d_events,
               CAST(SUM(cens) AS BIGINT) AS c_censored
        FROM lif GROUP BY t
    ), tot AS (SELECT COUNT(*) AS n_total FROM lif
    ), risk AS (
        SELECT t, d_events, c_censored,
               tot.n_total
               - COALESCE(SUM(d_events + c_censored) OVER (
                     ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) AS n_risk
        FROM hist CROSS JOIN tot
    ), curve AS (
        SELECT t, n_risk, d_events, c_censored,
               CASE WHEN MIN(n_risk - d_events) OVER w = 0
                    THEN 0.0
                    ELSE EXP(SUM(CASE WHEN d_events > 0
                                      AND n_risk > d_events
                                 THEN LN((n_risk - d_events) * 1.0
                                         / n_risk)
                                 ELSE 0.0 END) OVER w)
               END AS s
        FROM risk
        WINDOW w AS (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW)
    )
    SELECT CAST(t AS BIGINT) AS t,
           CAST(n_risk AS BIGINT) AS n_risk,
           d_events, c_censored,
           ROUND(5e-10 + s, 4) AS survival
    FROM curve ORDER BY t
"""


def km_curve(lifetimes: DataFrame) -> DataFrame:
    """KM table from a (t, cens) lifetime DataFrame: one bounded
    histogram groupBy, then ordered windows over it."""
    hist = lifetimes.groupBy("t").agg(
        F.sum(1 - F.col("cens")).cast("long").alias("d_events"),
        F.sum("cens").cast("long").alias("c_censored"),
    )
    tot = lifetimes.agg(F.count(F.lit(1)).alias("n_total"))
    prior = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    upto = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = hist.crossJoin(F.broadcast(tot)).withColumn(
        "n_risk",
        F.col("n_total")
        - F.coalesce(
            F.sum(F.col("d_events") + F.col("c_censored")).over(
                prior
            ),
            F.lit(0),
        ),
    )
    # the d == n extinction row would put LN(0) inside the window sum —
    # DuckDB RAISES on LN(0) (and CASE does not short-circuit window
    # aggregates), Spark returns NULL and poisons the sum — so the
    # guard must live INSIDE the ln term on both engines; the outer
    # CASE then forces survival to exact 0.0 from that row on.
    ln_term = F.when(
        (F.col("d_events") > 0)
        & (F.col("n_risk") > F.col("d_events")),
        F.log(
            (F.col("n_risk") - F.col("d_events"))
            * F.lit(1.0)
            / F.col("n_risk")
        ),
    ).otherwise(F.lit(0.0))
    surv = F.when(
        F.min(F.col("n_risk") - F.col("d_events")).over(upto) == 0,
        F.lit(0.0),
    ).otherwise(F.exp(F.sum(ln_term).over(upto)))
    return (
        risk.select(
            F.col("t").cast("long").alias("t"),
            F.col("n_risk").cast("long").alias("n_risk"),
            "d_events",
            "c_censored",
            biased_round(surv).alias("survival"),
        )
        .orderBy("t")
    )


@register(
    "ts_kaplan_meier",
    oracle=_KM_ORACLE,
    doc="Kaplan-Meier survival curve of user RETURN GAPS (hours from "
    "each event to the same user's next; the final gap of every user "
    "is right-censored at corpus end): gap extraction is one "
    "user-partitioned window (the sessionize shape), then every "
    "estimator quantity — reverse-cumulative risk sets, the log-space "
    "ordered cumulative product — windows over the hours-bounded gap "
    "histogram. Gap hours floor a µs-exact epoch difference on both "
    "engines; integer arithmetic up to the survival product, which is "
    "EXP(ordered SUM of LN((n-d)/n)) with identical libm calls and "
    "order on both engines; the d == n extinction row is special-cased "
    "to exact 0.0 (LN(0) is NULL on Spark, -inf in DuckDB). S(t) = "
    "probability a user stays away more than t hours — the "
    "censoring-correct retention curve.",
)
def ts_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.functions.casts import ts_diff_seconds

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts"
    )
    mx = ev.agg(F.max("ts").alias("max_ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    gaps = ev.crossJoin(F.broadcast(mx)).select(
        F.floor(
            ts_diff_seconds(
                F.col("ts"), F.coalesce(nxt, F.col("max_ts"))
            )
            / 3600
        )
        .cast("long")
        .alias("t"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("cens"),
    )
    return km_curve(gaps)


# ---------------------------------------------------------------------------
# Log-rank test between experiment arms

_LR_SALT = "ab-v1"  # the SAME arm assignment as events_ab_test
_LR_CHI1_95 = 3.8415  # chi-square(1) 95% quantile, fixed literal


@register(
    "ts_logrank_test",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, event_id, ts,
               CASE WHEN ('0x' || substring(md5('{_LR_SALT}'
                    || CAST(user_id AS VARCHAR)), 1, 4))::BIGINT
                    < 32768 THEN 'A' ELSE 'B' END AS arm
        FROM events
    ), mx AS (SELECT MAX(ts) AS max_ts FROM ev
    ), gaps AS (
        SELECT arm,
               CAST(FLOOR((epoch(COALESCE(LEAD(ts) OVER w, mx.max_ts))
                           - epoch(ts)) / 3600) AS BIGINT) AS t,
               CASE WHEN LEAD(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS cens
        FROM ev CROSS JOIN mx
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), hist AS (
        SELECT t,
               SUM(CASE WHEN arm = 'A' AND cens = 0
                   THEN 1 ELSE 0 END) AS da,
               SUM(CASE WHEN arm = 'B' AND cens = 0
                   THEN 1 ELSE 0 END) AS db,
               SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS xa,
               SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS xb
        FROM gaps GROUP BY t
    ), tot AS (
        SELECT SUM(xa) AS ta, SUM(xb) AS tb FROM hist
    ), risk AS (
        SELECT t, da, db,
               tot.ta - COALESCE(SUM(xa) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS na,
               tot.tb - COALESCE(SUM(xb) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS nb
        FROM hist CROSS JOIN tot
    ), terms AS (
        SELECT t, da, na, nb, da + db AS d, na + nb AS n,
               (da + db) * (na * 1.0 / (na + nb)) AS ea,
               CASE WHEN na + nb > 1
                    THEN (da + db) * (na * 1.0 / (na + nb))
                         * (1.0 - na * 1.0 / (na + nb))
                         * ((na + nb) - (da + db))
                         * 1.0 / ((na + nb) - 1)
                    ELSE 0.0 END AS v
        FROM risk WHERE da + db > 0
    ), agg AS (
        SELECT CAST(SUM(da) AS BIGINT) AS o_a,
               SUM(ea ORDER BY t) AS e_a,
               SUM(da - ea ORDER BY t) AS diff,
               SUM(v ORDER BY t) AS var
        FROM terms
    )
    SELECT o_a,
           ROUND(5e-10 + e_a, 4) AS e_a,
           ROUND(5e-10 + diff * diff / var, 4) AS chi2,
           ROUND(5e-10 + diff * diff / var, 4)
               > {_LR_CHI1_95} AS significant
    FROM agg
    """,
    doc="Log-rank test (Mantel-Cox) comparing the two experiment "
    "arms' return-gap survival curves — the censoring-correct A/B "
    "test for time-to-event outcomes (a naive mean-gap comparison is "
    "biased by the truncated window). Same md5 arm assignment as "
    "events_ab_test, same gap extraction as ts_kaplan_meier (one "
    "user-partitioned window); all risk sets, expectations and the "
    "hypergeometric variance are windows/aggregates over the "
    "hours-bounded gap histogram, with the float sums ordered by t "
    "on both engines. The 5%-level call binds on the biased-rounded "
    "chi-square against the fixed 3.8415 literal (rounded-gate "
    "rule).",
)
def ts_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.functions.casts import ts_diff_seconds

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts"
    )
    hex4 = F.substring(
        F.md5(
            F.concat(F.lit(_LR_SALT), F.col("user_id").cast("string"))
        ),
        1,
        4,
    )
    arm = F.when(
        F.conv(hex4, 16, 10).cast("long") < 32768, "A"
    ).otherwise("B")
    mx = ev.agg(F.max("ts").alias("max_ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    gaps = ev.crossJoin(F.broadcast(mx)).select(
        arm.alias("arm"),
        F.floor(
            ts_diff_seconds(
                F.col("ts"), F.coalesce(nxt, F.col("max_ts"))
            )
            / 3600
        )
        .cast("long")
        .alias("t"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("cens"),
    )
    isa = F.col("arm") == "A"
    hist = gaps.groupBy("t").agg(
        F.sum(F.when(isa & (F.col("cens") == 0), 1).otherwise(0)).alias("da"),
        F.sum(
            F.when((~isa) & (F.col("cens") == 0), 1).otherwise(0)
        ).alias("db"),
        F.sum(F.when(isa, 1).otherwise(0)).alias("xa"),
        F.sum(F.when(~isa, 1).otherwise(0)).alias("xb"),
    )
    tot = hist.agg(
        F.sum("xa").alias("ta"), F.sum("xb").alias("tb")
    )
    prior = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = hist.crossJoin(F.broadcast(tot)).select(
        "t",
        "da",
        "db",
        (
            F.col("ta")
            - F.coalesce(F.sum("xa").over(prior), F.lit(0))
        ).alias("na"),
        (
            F.col("tb")
            - F.coalesce(F.sum("xb").over(prior), F.lit(0))
        ).alias("nb"),
    )
    na, nb = F.col("na"), F.col("nb")
    d = F.col("da") + F.col("db")
    n = na + nb
    share = na * F.lit(1.0) / n
    ea = d * share
    v = F.when(
        n > 1,
        d * share * (F.lit(1.0) - share) * (n - d) * F.lit(1.0) / (n - 1),
    ).otherwise(F.lit(0.0))
    terms = risk.filter(d > 0).select(
        "t", "da", ea.alias("ea"), (F.col("da") - ea).alias("dif"), v.alias("v")
    )
    # days-bounded table: ordered sums via a full-window cumulative,
    # taking the last row (mirrors the oracle's SUM(... ORDER BY t))
    full = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    lastrow = Window.orderBy(F.desc("t"))
    agg = (
        terms.select(
            F.sum("da").over(full).alias("o_a"),
            F.sum("ea").over(
                Window.orderBy("t").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ).alias("e_cum"),
            F.sum("dif").over(
                Window.orderBy("t").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ).alias("diff_cum"),
            F.sum("v").over(
                Window.orderBy("t").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ).alias("var_cum"),
            F.row_number().over(lastrow).alias("rn"),
        )
        .filter(F.col("rn") == 1)
    )
    chi2 = biased_round(
        F.col("diff_cum") * F.col("diff_cum") / F.col("var_cum")
    )
    return agg.select(
        F.col("o_a").cast("long").alias("o_a"),
        biased_round(F.col("e_cum")).alias("e_a"),
        chi2.alias("chi2"),
        (chi2 > F.lit(_LR_CHI1_95)).alias("significant"),
    )
