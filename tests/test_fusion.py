"""Fusion tests: host strategy semantics (reference fusion.rs unit tests,
e.g. RRF 2/61 math, fusion.rs:314-325) plus device/host parity over
randomized candidate lists, and determinism/subset proptest invariants
(fusion.rs:544-616)."""

import numpy as np
import pytest
from hypothesis import example, given, settings, strategies as st

from trueno_rag_tpu.fusion import FusionStrategy
from trueno_rag_tpu.errors import InvalidConfigError
from trueno_rag_tpu.ops.fusion import fuse_topk

NEG_INF = float("-inf")


def test_rrf_math():
    # id present at rank 0 in both lists: score = 2 * 1/(60+0+1) = 2/61
    dense = [(1, 0.9), (2, 0.5)]
    sparse = [(1, 7.0), (3, 2.0)]
    fused = FusionStrategy.rrf(60.0).fuse(dense, sparse)
    assert fused[0][0] == 1
    assert fused[0][1] == pytest.approx(2 / 61)
    assert {i for i, _ in fused} == {1, 2, 3}


def test_linear_minmax_and_weights():
    dense = [(1, 10.0), (2, 0.0)]
    sparse = [(2, 5.0), (3, 1.0)]
    fused = dict(FusionStrategy.linear(0.7).fuse(dense, sparse))
    assert fused[1] == pytest.approx(0.7 * 1.0)
    assert fused[2] == pytest.approx(0.7 * 0.0 + 0.3 * 1.0)
    assert fused[3] == pytest.approx(0.3 * 0.0)


def test_linear_all_equal_normalizes_to_one():
    dense = [(1, 3.0), (2, 3.0)]
    fused = dict(FusionStrategy.linear(0.5).fuse(dense, []))
    assert fused[1] == pytest.approx(0.5) and fused[2] == pytest.approx(0.5)


def test_convex_delegates_to_linear():
    dense = [(1, 2.0), (2, 1.0)]
    sparse = [(3, 9.0)]
    a = FusionStrategy.convex(0.3).fuse(dense, sparse)
    b = FusionStrategy.linear(0.3).fuse(dense, sparse)
    assert a == b


def test_dbsf_zscore():
    dense = [(1, 2.0), (2, 0.0)]  # mean 1, std 1 -> z = +1, -1
    sparse = [(1, 4.0), (3, 0.0)]  # mean 2, std 2 -> z = +1, -1
    fused = dict(FusionStrategy.dbsf().fuse(dense, sparse))
    assert fused[1] == pytest.approx(2.0)
    assert fused[2] == pytest.approx(-1.0)
    assert fused[3] == pytest.approx(-1.0)


def test_dbsf_zero_variance():
    fused = dict(FusionStrategy.dbsf().fuse([(1, 5.0), (2, 5.0)], []))
    assert fused[1] == 0.0 and fused[2] == 0.0


def test_union_dense_wins_order_and_scores():
    dense = [(1, 0.2), (2, 0.1)]
    sparse = [(2, 99.0), (3, 42.0)]
    fused = FusionStrategy.union().fuse(dense, sparse)
    assert fused == [(1, 0.2), (2, 0.1), (3, 42.0)]


def test_intersection_mean_scores():
    dense = [(1, 1.0), (2, 3.0)]
    sparse = [(2, 1.0), (3, 9.0)]
    fused = FusionStrategy.intersection().fuse(dense, sparse)
    assert fused == [(2, 2.0)]


def test_unknown_kind_rejected():
    with pytest.raises(InvalidConfigError):
        FusionStrategy("bogus", {})


def test_serialization_roundtrip():
    for s in [
        FusionStrategy.rrf(30),
        FusionStrategy.linear(0.2),
        FusionStrategy.convex(0.9),
        FusionStrategy.dbsf(),
        FusionStrategy.union(),
        FusionStrategy.intersection(),
    ]:
        assert FusionStrategy.from_dict(s.to_dict()) == s


# ------------------------------------------------------- device parity ----


def _to_padded(lst, width):
    rows = np.full(width, -1, dtype=np.int32)
    scores = np.full(width, NEG_INF, dtype=np.float32)
    for i, (r, s) in enumerate(lst[:width]):
        rows[i], scores[i] = r, s
    return rows[None, :], scores[None, :]


def _from_padded(rows, scores):
    out = []
    for r, s in zip(np.asarray(rows[0]), np.asarray(scores[0])):
        if r >= 0:
            out.append((int(r), float(s)))
    return out


STRATS = [
    ("rrf", 60.0, FusionStrategy.rrf(60.0)),
    ("rrf", 10.0, FusionStrategy.rrf(10.0)),
    ("linear", 0.5, FusionStrategy.linear(0.5)),
    ("linear", 0.8, FusionStrategy.linear(0.8)),
    ("convex", 0.3, FusionStrategy.convex(0.3)),
    ("dbsf", 0.0, FusionStrategy.dbsf()),
    ("union", 0.0, FusionStrategy.union()),
    ("intersection", 0.0, FusionStrategy.intersection()),
]


@pytest.mark.parametrize("kind,param,host", STRATS, ids=[f"{k}-{p}" for k, p, _ in STRATS])
def test_device_matches_host(kind, param, host):
    rng = np.random.Generator(np.random.PCG64(42))
    for trial in range(5):
        nd, ns = int(rng.integers(0, 6)), int(rng.integers(0, 6))
        d_rows = rng.choice(20, size=nd, replace=False)
        s_rows = rng.choice(20, size=ns, replace=False)
        dense = sorted(
            [(int(r), float(np.round(rng.random() * 4, 3))) for r in d_rows],
            key=lambda kv: (-kv[1], kv[0]),
        )
        sparse = sorted(
            [(int(r), float(np.round(rng.random() * 4, 3))) for r in s_rows],
            key=lambda kv: (-kv[1], kv[0]),
        )
        expected = host.fuse(dense, sparse)
        rd, sd = _to_padded(dense, 8)
        rs, ss = _to_padded(sparse, 8)
        rows_o, scores_o = fuse_topk(rd, sd, rs, ss, kind=kind, param=param)
        got = _from_padded(rows_o, scores_o)
        if kind == "union":
            assert got == [(r, pytest.approx(s, rel=1e-5)) for r, s in expected]
        else:
            # same id->score mapping; same deterministic order
            assert [r for r, _ in got] == [r for r, _ in expected], (trial, got, expected)
            for (r1, s1), (r2, s2) in zip(got, expected):
                assert s1 == pytest.approx(s2, rel=1e-4, abs=1e-6)


@settings(max_examples=50, deadline=None)
@given(
    dense=st.lists(st.tuples(st.integers(0, 15), st.floats(0, 10, allow_nan=False, width=32)), max_size=6, unique_by=lambda t: t[0]),
    sparse=st.lists(st.tuples(st.integers(0, 15), st.floats(0, 10, allow_nan=False, width=32)), max_size=6, unique_by=lambda t: t[0]),
)
# pinned edges: all-equal scores exercise the min-max all-equal -> 1.0
# contract (fusion.rs:183-202) and sigma=0 z-scores -> 0.0
# (fusion.rs:204-224); one-empty-list exercises the union rank offset
@example(dense=[(1, 2.0), (2, 2.0), (3, 2.0)], sparse=[(2, 5.0)])
@example(dense=[(4, 1.0)], sparse=[(7, 3.0), (8, 3.0)])
@example(dense=[], sparse=[(0, 0.0)])
def test_property_fusion_invariants(dense, sparse):
    dense = sorted(dense, key=lambda kv: (-kv[1], kv[0]))
    sparse = sorted(sparse, key=lambda kv: (-kv[1], kv[0]))
    ids_in = {i for i, _ in dense} | {i for i, _ in sparse}
    for strat in [FusionStrategy.rrf(), FusionStrategy.linear(0.5), FusionStrategy.dbsf(), FusionStrategy.union()]:
        fused = strat.fuse(dense, sparse)
        assert {i for i, _ in fused} == ids_in  # no loss, no invention
        assert fused == strat.fuse(dense, sparse)  # deterministic
    inter = FusionStrategy.intersection().fuse(dense, sparse)
    assert {i for i, _ in inter} == ({i for i, _ in dense} & {i for i, _ in sparse})


def test_linear_alpha_fallback_matches_device_param():
    """Regression (review r3): host fuse() accepted 'alpha' for linear
    but device_param ignored it — host and device fused with different
    weights."""
    from trueno_rag_tpu.fusion import FusionStrategy

    f = FusionStrategy.from_dict({"kind": "linear", "params": {"alpha": 0.8}})
    assert f.device_param == pytest.approx(0.8)
