"""Retrieval-metrics tests with hand-computed expectations."""

import math

import pytest

from ragroute_tpu.eval_metrics import evaluate_retrieval


def test_perfect_ranking():
    qrels = {"q1": {"a": 1, "b": 1}}
    results = {"q1": {"a": 0.9, "b": 0.8, "c": 0.1}}
    m = evaluate_retrieval(qrels, results, k_values=[2])
    assert m["NDCG@2"] == pytest.approx(1.0)
    assert m["Recall@2"] == pytest.approx(1.0)
    assert m["P@2"] == pytest.approx(1.0)
    assert m["MAP@2"] == pytest.approx(1.0)
    assert m["MRR@2"] == pytest.approx(1.0)


def test_hand_computed_ndcg():
    # ranking: [irrelevant, rel=2, rel=1]; ideal: [2, 1]
    qrels = {"q": {"x": 2, "y": 1}}
    results = {"q": {"z": 0.9, "x": 0.8, "y": 0.7}}
    m = evaluate_retrieval(qrels, results, k_values=[3])
    dcg = (2**2 - 1) / math.log2(3) + (2**1 - 1) / math.log2(4)
    idcg = (2**2 - 1) / math.log2(2) + (2**1 - 1) / math.log2(3)
    assert m["NDCG@3"] == pytest.approx(dcg / idcg)
    # MAP@3: precisions at hits: x at rank2 -> 1/2, y at rank3 -> 2/3
    assert m["MAP@3"] == pytest.approx((0.5 + 2 / 3) / 2)
    assert m["MRR@3"] == pytest.approx(0.5)
    assert m["Recall@3"] == pytest.approx(1.0)
    assert m["P@3"] == pytest.approx(2 / 3)


def test_partial_recall_and_mean_over_queries():
    qrels = {
        "q1": {"a": 1, "b": 1, "c": 1, "d": 1},
        "q2": {"e": 1},
    }
    results = {
        "q1": {"a": 0.9, "x": 0.8},   # 1 of 4 found
        "q2": {"y": 0.9, "e": 0.8},   # found at rank 2
    }
    m = evaluate_retrieval(qrels, results, k_values=[2])
    assert m["Recall@2"] == pytest.approx((0.25 + 1.0) / 2)
    assert m["MRR@2"] == pytest.approx((1.0 + 0.5) / 2)


def test_missing_query_counts_as_zero():
    qrels = {"q1": {"a": 1}, "q2": {"b": 1}}
    results = {"q1": {"a": 1.0}}  # q2 never answered
    m = evaluate_retrieval(qrels, results, k_values=[1])
    assert m["NDCG@1"] == pytest.approx(0.5)
    assert m["Recall@1"] == pytest.approx(0.5)
