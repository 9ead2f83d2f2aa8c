"""Training-data operators: split stability, mix monotonicity, packing
invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from economic_data_etl_spark.operators import training
from economic_data_etl_spark.sources.tables import load_table

SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


class TestHashSplit:
    def test_partition_layout_does_not_change_assignment(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        a = training.hash_split(docs, "doc_id", SPLITS)
        b = training.hash_split(docs.repartition(17), "doc_id", SPLITS)
        diff = (
            a.select("doc_id", "split")
            .join(b.select("doc_id", F.col("split").alias("split2")), "doc_id")
            .filter(F.col("split") != F.col("split2"))
            .count()
        )
        assert diff == 0

    def test_fractions_roughly_respected(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        n = docs.count()
        counts = dict(
            training.hash_split(docs, "doc_id", SPLITS)
            .groupBy("split")
            .count()
            .collect()
        )
        assert counts["train"] / n > 0.7
        assert 0.03 < counts["val"] / n < 0.2
        assert set(counts) == {"train", "val", "test"}


class TestWeightedMix:
    def test_raising_a_rate_only_adds_documents(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        low = training.weighted_mix(docs, "lang", {"en": 0.2}, "doc_id")
        high = training.weighted_mix(docs, "lang", {"en": 0.6}, "doc_id")
        lost = low.select("doc_id").exceptAll(high.select("doc_id")).count()
        assert lost == 0
        assert high.count() > low.count()


class TestPackSequences:
    def test_packing_invariants(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        budget = 2048
        packs = training.pack_sequences(
            docs, "doc_id", "n_chars", budget=budget, num_shards=8
        ).persist()

        # Every document packed exactly once.
        packed_ids = packs.select(F.explode("keys").alias("doc_id"))
        assert packed_ids.count() == docs.count()
        assert packed_ids.distinct().count() == docs.count()

        # Budget respected except singleton oversize docs.
        violators = packs.filter(
            (F.col("total_size") > budget) & (F.col("n_items") > 1)
        ).count()
        assert violators == 0

        # Sizes preserved end-to-end.
        total = packs.agg(F.sum("total_size")).collect()[0][0]
        want = docs.agg(F.sum("n_chars")).collect()[0][0]
        assert total == want

        # FFD should fill bins decently (multi-item packs only; the tail
        # pack of each shard may be near-empty).
        fill = (
            packs.filter(F.col("n_items") > 1)
            .agg(F.avg("fill"))
            .collect()[0][0]
        )
        assert fill is None or fill >= 0.7
        packs.unpersist()

    def test_packing_invariants_hold_on_random_inputs(self, spark):
        """Property check: for arbitrary size distributions (including
        zero-size and oversize items) every key is packed exactly once
        and no multi-item pack exceeds the budget."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        budget = 100
        sizes = st.lists(
            st.integers(min_value=0, max_value=250), min_size=1, max_size=40
        )

        @settings(
            max_examples=10,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(sizes=sizes)
        def run(sizes):
            rows = [(i, s) for i, s in enumerate(sizes)]
            df = spark.createDataFrame(rows, "doc_id long, n long")
            packs = training.pack_sequences(
                df, "doc_id", "n", budget=budget, num_shards=4
            ).collect()
            packed = [k for r in packs for k in r["keys"]]
            assert sorted(packed) == list(range(len(sizes)))
            for r in packs:
                if r["n_items"] > 1:
                    assert r["total_size"] <= budget
                assert r["total_size"] == sum(sizes[k] for k in r["keys"])

        run()

    def test_packing_is_deterministic(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        a = training.pack_sequences(docs, "doc_id", "n_chars", 2048)
        b = training.pack_sequences(docs.repartition(13), "doc_id", "n_chars", 2048)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


class TestSplitLeakage:
    def test_planted_leak_is_flagged(self, spark, tmp_path):
        """A test-split vector planted (nearly) identical to a
        train-split vector must surface as rank 1 with leaked=TRUE;
        orthogonal vectors must not. Split membership under the md5
        bucket (salt 'split-v1'): 12/15/29 -> test, 0/1/2 -> train."""
        import math

        from economic_data_etl_spark.plans import REGISTRY

        def unit(i, n=8):
            v = [0.0] * n
            v[i] = 1.0
            return v

        rows = [
            (0, unit(0)),           # train
            (1, unit(1)),           # train
            (2, unit(2)),           # train
            (12, unit(0)),          # test: identical to train 0 -> leak
            (15, [0.9, 0.1] + [0.0] * 6),  # test: cos ~0.9939 to 0
            (29, unit(3)),          # test: orthogonal to all train
        ]
        df = spark.createDataFrame(
            [(i, v, 0) for i, v in rows],
            "vec_id long, embedding array<float>, label int",
        )
        df.write.parquet(str(tmp_path / "embeddings.parquet"))
        out = {
            r.test_id: r
            for r in REGISTRY["training_split_leakage"]
            .spark(spark, str(tmp_path))
            .collect()
        }
        assert out[12].train_id == 0 and out[12].leaked
        assert out[12].cos_r == 1.0 and out[12].rank == 1
        assert out[15].train_id == 0 and out[15].leaked  # 0.9939 >= 0.9
        assert math.isclose(out[15].cos_r, 0.9939, abs_tol=1e-9)
        assert not out[29].leaked and out[29].cos_r == 0.0
