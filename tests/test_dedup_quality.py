"""Dedup-operator quality tests: the distributed implementations must
agree with a straightforward driver-side model on a small sample."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from economic_data_etl_spark.operators import dedup
from economic_data_etl_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _py_shingles(text: str, n: int = 3) -> set[str]:
    toks = [t for t in text.split() if t]
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


class TestJaccardAgainstModel:
    def test_pairs_match_python_model(self, spark):
        docs = load_table(spark, SF_DIR, "documents").limit(60)
        local = {r["doc_id"]: r["text"] for r in docs.collect()}

        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup.jaccard_similar_pairs(
                docs, "doc_id", "text", n=3, threshold=0.3
            ).collect()
        }

        want = {}
        ids = sorted(local)
        for i, a in enumerate(ids):
            sa = _py_shingles(local[a])
            for b in ids[i + 1 :]:
                sb = _py_shingles(local[b])
                inter = len(sa & sb)
                if inter == 0:
                    continue
                jac = inter / (len(sa) + len(sb) - inter)
                if jac >= 0.3:
                    want[(a, b)] = round(jac, 4)

        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=2e-4)


class TestMinhashFindsPlantedDups:
    def test_minhash_recovers_high_jaccard_pairs(self, spark):
        docs = load_table(spark, SF_DIR, "documents")
        exact = {
            (r["id_a"], r["id_b"])
            for r in dedup.jaccard_similar_pairs(
                docs, "doc_id", "text", n=3, threshold=0.9
            ).collect()
        }
        assert exact, "testdata should contain planted near-duplicates"
        approx = {
            (r["id_a"], r["id_b"])
            for r in dedup.minhash_dedup_pairs(
                docs, "doc_id", "text", num_perm=64, bands=16, threshold=0.5
            ).collect()
        }
        # every >=0.9-jaccard pair must be recovered by MinHash-LSH
        missed = exact - approx
        assert not missed, f"minhash missed planted dups: {missed}"


class TestSimhashAgreesWithJaccard:
    def test_low_hamming_pairs_are_high_jaccard(self, spark):
        docs = load_table(spark, SF_DIR, "documents")
        sim_pairs = {
            (r["id_a"], r["id_b"])
            for r in dedup.simhash_candidate_pairs(docs, "doc_id", "text", chunks=4)
            .filter(F.col("hamming") <= 3)
            .collect()
        }
        jac_pairs = {
            (r["id_a"], r["id_b"])
            for r in dedup.jaccard_similar_pairs(
                docs, "doc_id", "text", n=1, threshold=0.5
            ).collect()
        }
        # simhash(hamming<=3) pairs should overwhelmingly be >=0.5
        # token-jaccard pairs (token-based fingerprints)
        if sim_pairs:
            agreement = len(sim_pairs & jac_pairs) / len(sim_pairs)
            assert agreement >= 0.8

    def test_prefix_filtered_jaccard_equals_naive(self, spark):
        """The PPJoin-style prefix-filtered join is an exact algorithm:
        its output must equal the full inverted-index join pair-for-pair
        at multiple thresholds (including ones low enough to stress the
        prefix-length math)."""
        docs = load_table(spark, SF_DIR, "documents")
        for thr in (0.3, 0.5, 0.8):
            naive = sorted(
                map(
                    tuple,
                    dedup.jaccard_similar_pairs(
                        docs, "doc_id", "text", n=3, threshold=thr
                    ).collect(),
                )
            )
            fast = sorted(
                map(
                    tuple,
                    dedup.jaccard_similar_pairs_prefix(
                        docs, "doc_id", "text", n=3, threshold=thr
                    ).collect(),
                )
            )
            assert naive == fast, f"divergence at threshold {thr}"

    def test_arrow_fast_path_is_bit_identical(self, spark):
        """simhash_arrow (numpy majority vote) must reproduce the pure
        expression simhash() exactly, including null text (null fp) and
        empty/whitespace text (all-ones fingerprint, -1)."""
        docs = load_table(spark, SF_DIR, "documents")
        edge = spark.createDataFrame(
            [(None,), ("",), ("   ",), ("single",)], "text string"
        )
        for df in (docs, edge):
            mismatches = (
                df.select(
                    dedup.simhash(F.col("text")).alias("expr"),
                    dedup.simhash_arrow(F.col("text")).alias("arrow"),
                )
                .filter(~F.col("expr").eqNullSafe(F.col("arrow")))
                .count()
            )
            assert mismatches == 0


def test_incremental_minhash_matches_full_rebuild(spark, sf_dir):
    """Pairs touching the incoming batch must be identical whether the
    corpus is deduped wholesale or the batch is joined against the
    standing signature index."""
    from pyspark.sql import functions as F

    from economic_data_etl_spark.operators import dedup
    from economic_data_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    standing = docs.filter(F.col("source") != "src10")
    incoming = docs.filter(F.col("source") == "src10")
    inc_ids = {r[0] for r in incoming.select("doc_id").collect()}

    full = dedup.minhash_dedup_pairs(
        docs, "doc_id", "text", num_perm=32, bands=8, threshold=0.5
    ).collect()
    want = {
        (r["id_a"], r["id_b"], r["est_jaccard"])
        for r in full
        if r["id_a"] in inc_ids or r["id_b"] in inc_ids
    }

    index_sigs = dedup.minhash_signatures(
        standing, "doc_id", "text", num_perm=32, shingle_n=3
    )
    got = {
        (r["id_a"], r["id_b"], r["est_jaccard"])
        for r in dedup.minhash_incremental_pairs(
            index_sigs, incoming, "doc_id", "text",
            num_perm=32, bands=8, threshold=0.5,
        ).collect()
    }
    assert got == want
    assert want, "fixture must contain at least one batch-touching pair"
