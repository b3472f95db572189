"""Metrics tests — mirrors the reference's metrics.rs unit tests and the
bounded-metrics proptest invariants (metrics.rs:515-570), including the
checked-in NDCG duplicate-id regression (proptest-regressions/metrics.txt)."""

import pytest
from hypothesis import example, given, settings, strategies as st

from trueno_rag_tpu.chunking import chunk_id_from_int as cid
from trueno_rag_tpu.metrics import (
    AggregatedMetrics,
    RetrievalMetrics,
    average_precision,
    f1_at_k,
    hit_rate_at_k,
    mean_reciprocal_rank,
    ndcg_at_k,
    precision_at_k,
    recall_at_k,
)


def ids(*ns):
    return [cid(n) for n in ns]


def test_recall_precision_basic():
    retrieved = ids(1, 2, 3, 4, 5)
    relevant = set(ids(1, 3, 9))
    assert recall_at_k(retrieved, relevant, 5) == pytest.approx(2 / 3)
    assert precision_at_k(retrieved, relevant, 5) == pytest.approx(2 / 5)
    assert recall_at_k(retrieved, set(), 5) == 0.0
    assert precision_at_k(retrieved, relevant, 0) == 0.0


def test_mrr():
    assert mean_reciprocal_rank(ids(7, 1, 2), set(ids(1))) == pytest.approx(0.5)
    assert mean_reciprocal_rank(ids(1, 2), set(ids(1))) == pytest.approx(1.0)
    assert mean_reciprocal_rank(ids(5, 6), set(ids(1))) == 0.0


def test_ndcg_perfect_and_zero():
    relevant = set(ids(1, 2))
    assert ndcg_at_k(ids(1, 2, 3), relevant, 3) == pytest.approx(1.0)
    assert ndcg_at_k(ids(3, 4, 5), relevant, 3) == 0.0


def test_ndcg_duplicate_ids_regression():
    # The reference's proptest regression: duplicate retrieved ids must not
    # push NDCG above 1.0 (metrics.rs:103-116).
    relevant = set(ids(1))
    v = ndcg_at_k(ids(1, 1, 1, 1), relevant, 4)
    assert 0.0 <= v <= 1.0
    assert v == pytest.approx(1.0)


def test_average_precision():
    retrieved = ids(1, 9, 2)
    relevant = set(ids(1, 2))
    # hits at ranks 0 (p=1/1) and 2 (p=2/3) → AP = (1 + 2/3)/2
    assert average_precision(retrieved, relevant) == pytest.approx((1.0 + 2 / 3) / 2)


def test_f1_and_hit_rate():
    retrieved = ids(1, 2, 3, 4)
    relevant = set(ids(1, 9))
    p = precision_at_k(retrieved, relevant, 4)
    r = recall_at_k(retrieved, relevant, 4)
    assert f1_at_k(retrieved, relevant, 4) == pytest.approx(2 * p * r / (p + r))
    assert hit_rate_at_k(retrieved, relevant, 4) == 1.0
    assert hit_rate_at_k(retrieved, set(ids(42)), 4) == 0.0
    assert f1_at_k(retrieved, set(ids(42)), 4) == 0.0


def test_compute_and_aggregate():
    m1 = RetrievalMetrics.compute(ids(1, 2, 3), ids(1), k_values=[1, 3])
    m2 = RetrievalMetrics.compute(ids(9, 1), ids(1), k_values=[1, 3])
    agg = AggregatedMetrics.aggregate([m1, m2])
    assert agg.num_queries == 2
    assert agg.mean_recall[1] == pytest.approx((1.0 + 0.0) / 2)
    assert agg.mean_mrr == pytest.approx((1.0 + 0.5) / 2)
    assert set(agg.mean_ndcg.keys()) == {1, 3}


def test_aggregate_empty():
    agg = AggregatedMetrics.aggregate([])
    assert agg.num_queries == 0
    assert agg.mean_mrr == 0.0


@settings(max_examples=60, deadline=None)
@given(
    retrieved=st.lists(st.integers(0, 30), max_size=40),
    relevant=st.sets(st.integers(0, 30), max_size=15),
    k=st.integers(0, 40),
)
# pinned regressions (the reference commits the equivalent proptest
# seed, proptest-regressions/metrics.txt): a duplicated retrieved id
# must not push NDCG above 1.0 (metrics.rs:103-116 dedup fix) ...
@example(retrieved=[0, 0], relevant={0}, k=2)
@example(retrieved=[3, 3, 3, 1], relevant={3, 1}, k=4)
# ... and the k=0 / empty-relevant / empty-retrieved boundaries
@example(retrieved=[1, 2], relevant=set(), k=0)
@example(retrieved=[], relevant={5}, k=3)
def test_property_all_metrics_bounded(retrieved, relevant, k):
    r = [cid(i) for i in retrieved]
    rel = {cid(i) for i in relevant}
    for fn in (recall_at_k, precision_at_k, ndcg_at_k, f1_at_k, hit_rate_at_k):
        v = fn(r, rel, k)
        assert 0.0 <= v <= 1.0, fn.__name__
    assert 0.0 <= mean_reciprocal_rank(r, rel) <= 1.0
    assert 0.0 <= average_precision(r, rel) <= 1.0


def test_ndcg_window_semantics_match_sibling_metrics():
    """Regression (review r3): dedup must happen WITHIN the top-k window
    (reference take(k)-then-dedup, metrics.rs:107-116) — deduplicating
    first slid ids ranked beyond k into the window, making NDCG@k
    report hits recall@k said were never retrieved."""
    from trueno_rag_tpu.metrics import ndcg_at_k, recall_at_k

    retrieved, relevant = ["A", "A", "B"], {"B"}
    assert recall_at_k(retrieved, relevant, 2) == 0.0
    assert ndcg_at_k(retrieved, relevant, 2) == 0.0  # B is outside top-2
    # within the window, the duplicate still gains only once, at its
    # ORIGINAL rank
    import math

    got = ndcg_at_k(["A", "A", "B"], {"A", "B"}, 3)
    ideal = 1.0 + 1.0 / math.log2(3)
    assert got == ((1.0 + 1.0 / math.log2(4)) / ideal)
