"""Planted MMR greedy test: diversity overrides raw relevance order."""

from __future__ import annotations

import pytest

from economic_data_etl_spark.plans.mmr import mmr_greedy


def _rows(d):
    class R(dict):
        def __getitem__(self, k):
            return dict.__getitem__(self, k)

    return [R(x) for x in d]


def test_redundant_runnerup_demoted():
    """B is nearly a duplicate of A (sim .99); C is less relevant but
    diverse — MMR must pick A, C, B while pure relevance says A, B, C."""
    cand = _rows(
        [
            {"doc_id": 1, "rel": 0.9},   # A
            {"doc_id": 2, "rel": 0.89},  # B, near-dup of A
            {"doc_id": 3, "rel": 0.6},   # C, diverse
        ]
    )
    sims = _rows(
        [
            {"i": 1, "j": 2, "sim": 0.99},
            {"i": 2, "j": 1, "sim": 0.99},
            {"i": 1, "j": 3, "sim": 0.1},
            {"i": 3, "j": 1, "sim": 0.1},
            {"i": 2, "j": 3, "sim": 0.1},
            {"i": 3, "j": 2, "sim": 0.1},
        ]
    )
    out = mmr_greedy(cand, sims, 3, 0.7)
    assert [d for _, d, _, _ in out] == [1, 3, 2]
    # step-2 marginal scores: B = .7*.89-.3*.99, C = .7*.6-.3*.1
    assert out[1][3] == pytest.approx(0.7 * 0.6 - 0.3 * 0.1)
    # seed emits pure relevance
    assert out[0][3] == 0.9


def test_tie_breaks_doc_id_asc():
    cand = _rows(
        [{"doc_id": 5, "rel": 0.8}, {"doc_id": 2, "rel": 0.8}]
    )
    sims = _rows(
        [
            {"i": 5, "j": 2, "sim": 0.5},
            {"i": 2, "j": 5, "sim": 0.5},
        ]
    )
    out = mmr_greedy(cand, sims, 2, 0.7)
    assert [d for _, d, _, _ in out] == [2, 5]
