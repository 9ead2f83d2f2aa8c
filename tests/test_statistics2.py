"""Behavioral invariants for the statistics2/text4 tranche, beyond the
value-exact oracle sweep (test_catalog_oracle.py covers those):

- market-basket pairs are canonical (a < b) and count-consistent with a
  direct per-order recount;
- EWMA stays inside the [min, max] envelope of its input series (a
  convex combination must);
- the 3-step funnel is monotone (each step's population is a subset of
  the previous);
- LM quality scores are strictly negative log-probabilities and cover
  every source;
- per-source dup-rate is in [0, 1] and zero only when all texts differ.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from economic_data_etl_spark.plans import REGISTRY
from economic_data_etl_spark.sources.tables import load_table


def test_market_basket_pairs_canonical_and_consistent(spark, sf_dir):
    out = REGISTRY["join_market_basket_pairs"].spark(spark, sf_dir)
    rows = out.collect()
    assert rows, "expected at least one co-occurring pair"
    assert all(r.part_a < r.part_b for r in rows)
    counts = [r.n_orders_together for r in rows]
    assert counts == sorted(counts, reverse=True)
    # Recount the top pair directly from lineitem.
    top = rows[0]
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    oa = {
        r.l_orderkey
        for r in li.filter(F.col("l_partkey") == top.part_a).collect()
    }
    ob = {
        r.l_orderkey
        for r in li.filter(F.col("l_partkey") == top.part_b).collect()
    }
    assert len(oa & ob) == top.n_orders_together


def test_ewma_within_series_envelope(spark, sf_dir):
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.avg("value").alias("day_value"))
        .groupBy("event_type")
        .agg(F.min("day_value").alias("lo"), F.max("day_value").alias("hi"))
    )
    out = REGISTRY["ts_ewma_smoothed"].spark(spark, sf_dir)
    bad = (
        out.join(daily, "event_type")
        .filter(
            (F.col("ewma_value") < F.col("lo") - 1e-4)
            | (F.col("ewma_value") > F.col("hi") + 1e-4)
        )
        .count()
    )
    assert bad == 0


def test_funnel_three_step_monotone(spark, sf_dir):
    row = REGISTRY["events_funnel_three_step"].spark(spark, sf_dir).collect()[0]
    assert row.n_signup >= row.n_viewed_after >= row.n_purchased_after >= 0
    assert row.n_signup > 0


def test_lateral_topn_two_per_nation(spark, sf_dir):
    out = REGISTRY["sql_lateral_topn_per_nation"].spark(spark, sf_dir)
    per_nation = out.groupBy("n_name").count().collect()
    assert per_nation
    assert all(r["count"] <= 2 for r in per_nation)


def test_lm_quality_scores_negative_all_sources(spark, sf_dir):
    out = REGISTRY["text_lm_quality_score"].spark(spark, sf_dir).collect()
    n_sources = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") >= 3)
        .select("source")
        .distinct()
        .count()
    )
    assert len(out) == n_sources
    for r in out:
        assert r.max_logprob < 0.0
        assert r.min_logprob <= r.avg_logprob <= r.max_logprob


def test_dup_rate_bounds(spark, sf_dir):
    for r in REGISTRY["dataset_dedup_rate_by_source"].spark(spark, sf_dir).collect():
        assert 0.0 <= r.dup_rate <= 1.0
        assert r.n_unique_texts <= r.n_docs


def test_weighted_sample_matches_exact_replay(spark, sf_dir):
    """The A-Res sample is a pure function of (salt, doc_id, n_chars) —
    replay it in plain Python and require the identical doc set."""
    import hashlib
    import math

    import duckdb

    rows = duckdb.sql(
        f"SELECT doc_id, n_chars FROM read_parquet('{sf_dir}/documents.parquet')"
        " WHERE n_chars > 0"
    ).fetchall()
    def key(doc_id, w):
        h = hashlib.md5(f"wsample-v1{doc_id}".encode()).hexdigest()
        u = (int(h[:4], 16) + 0.5) / 65536.0
        return math.log(u) / w
    want = [
        d for d, _ in sorted(
            ((d, key(d, w)) for d, w in rows), key=lambda t: (-t[1], t[0])
        )[:50]
    ]
    got = [
        r.doc_id
        for r in REGISTRY["curation_weighted_sample"].spark(spark, sf_dir).collect()
    ]
    assert got == want
