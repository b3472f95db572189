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


# --------------------------------------------------------- N-way fusion ----


NWAY_STRATS = [
    ("rrf", 60.0, FusionStrategy.rrf(60.0)),
    ("linear", 0.5, FusionStrategy.linear(0.5)),
    ("convex", 0.3, FusionStrategy.convex(0.3)),
    ("dbsf", 0.0, FusionStrategy.dbsf()),
    ("union", 0.0, FusionStrategy.union()),
    ("intersection", 0.0, FusionStrategy.intersection()),
]


def _rand_lists(rng, n_lists, id_space=24, max_len=6):
    lists = []
    for _ in range(n_lists):
        n = int(rng.integers(0, max_len))
        rows = rng.choice(id_space, size=n, replace=False)
        lists.append(sorted(
            [(int(r), float(np.round(rng.random() * 4, 3))) for r in rows],
            key=lambda kv: (-kv[1], kv[0]),
        ))
    return lists


@pytest.mark.parametrize("kind,param,host", NWAY_STRATS,
                         ids=[k for k, _, _ in NWAY_STRATS])
def test_fuse_many_two_lists_matches_fuse(kind, param, host):
    """fuse_many([d, s]) is exactly fuse(d, s) for every variant."""
    rng = np.random.Generator(np.random.PCG64(7))
    for _ in range(8):
        d, s = _rand_lists(rng, 2)
        assert host.fuse_many([d, s]) == host.fuse(d, s)


def test_fuse_many_rrf_three_way_math():
    # id 1 at rank 0 in all three lists: 3/61
    lists = [[(1, 0.9), (2, 0.5)], [(1, 7.0)], [(1, 2.0), (3, 1.0)]]
    fused = FusionStrategy.rrf(60.0).fuse_many(lists)
    assert fused[0][0] == 1
    assert fused[0][1] == pytest.approx(3 / 61)
    assert {i for i, _ in fused} == {1, 2, 3}


def test_fuse_many_linear_weights():
    lists = [[(1, 1.0)], [(2, 1.0)], [(3, 1.0)]]
    # single-entry lists min-max to 1.0 each -> scores are the weights
    fused = dict(FusionStrategy.linear(0.5).fuse_many(
        lists, weights=[0.6, 0.3, 0.1]))
    assert fused[1] == pytest.approx(0.6)
    assert fused[2] == pytest.approx(0.3)
    assert fused[3] == pytest.approx(0.1)
    # default N!=2 weights are uniform
    uni = dict(FusionStrategy.linear(0.5).fuse_many(lists))
    assert uni[1] == pytest.approx(1 / 3)
    # stored weights in params are honored and serialize
    strat = FusionStrategy("linear", {"weights": [0.5, 0.25, 0.25]})
    stored = dict(strat.fuse_many(lists))
    assert stored[1] == pytest.approx(0.5)
    assert FusionStrategy.from_dict(strat.to_dict()).fuse_many(lists) == \
        strat.fuse_many(lists)


def test_fuse_many_weight_arity_rejected():
    with pytest.raises(InvalidConfigError):
        FusionStrategy.linear(0.5).fuse_many(
            [[(1, 1.0)], [(2, 1.0)]], weights=[1.0])


def test_fuse_many_union_priority_order():
    lists = [[(1, 9.0), (2, 8.0)], [(2, 7.0), (3, 6.0)], [(3, 5.0), (4, 4.0)]]
    fused = FusionStrategy.union().fuse_many(lists)
    assert fused == [(1, 9.0), (2, 8.0), (3, 6.0), (4, 4.0)]


def test_fuse_many_intersection_all_lists():
    lists = [[(1, 3.0), (2, 1.0)], [(1, 6.0), (3, 2.0)], [(1, 0.0), (2, 5.0)]]
    fused = FusionStrategy.intersection().fuse_many(lists)
    assert fused == [(1, pytest.approx(3.0))]  # mean(3, 6, 0)


@pytest.mark.parametrize("kind,param,host", NWAY_STRATS,
                         ids=[k for k, _, _ in NWAY_STRATS])
@pytest.mark.parametrize("n_lists", [1, 2, 3, 4])
def test_fuse_topk_many_matches_host(kind, param, host, n_lists):
    """Device N-way fusion == host fuse_many on padded candidate lists."""
    from trueno_rag_tpu.ops.fusion import fuse_topk_many

    rng = np.random.Generator(np.random.PCG64(11 + n_lists))
    weights = tuple(host.resolve_weights(n_lists)) \
        if kind in ("linear", "convex") else ()
    for trial in range(4):
        lists = _rand_lists(rng, n_lists)
        expected = host.fuse_many(lists)
        padded = [_to_padded(lst, 8) for lst in lists]
        rows_o, scores_o = fuse_topk_many(
            tuple(p[0] for p in padded), tuple(p[1] for p in padded),
            kind=kind, param=param, weights=weights,
        )
        got = _from_padded(rows_o, scores_o)
        if kind == "union":
            assert got == [(r, pytest.approx(s, rel=1e-5)) for r, s in expected], \
                (trial, got, expected)
        else:
            assert [r for r, _ in got] == [r for r, _ in expected], \
                (trial, got, expected)
            for (r1, s1), (r2, s2) in zip(got, expected):
                assert s1 == pytest.approx(s2, rel=1e-4, abs=1e-6)


def test_fuse_topk_many_two_lists_matches_fuse_topk():
    from trueno_rag_tpu.ops.fusion import fuse_topk_many

    rng = np.random.Generator(np.random.PCG64(3))
    d, s = _rand_lists(rng, 2, max_len=5)
    rd, sd = _to_padded(d, 6)
    rs, ss = _to_padded(s, 6)
    for kind, param in [("rrf", 60.0), ("linear", 0.7), ("dbsf", 0.0),
                        ("union", 0.0), ("intersection", 0.0)]:
        w = (0.7, 0.3) if kind == "linear" else ()
        r1, s1 = fuse_topk(rd, sd, rs, ss, kind=kind, param=param)
        r2, s2 = fuse_topk_many((rd, rs), (sd, ss), kind=kind,
                                param=param, weights=w)
        assert _from_padded(r1, s1) == _from_padded(r2, s2), kind


def test_fuse_topk_many_batched():
    from trueno_rag_tpu.ops.fusion import fuse_topk_many

    rng = np.random.Generator(np.random.PCG64(5))
    host = FusionStrategy.rrf(60.0)
    batches = [_rand_lists(rng, 3) for _ in range(4)]
    rows = tuple(
        np.concatenate([_to_padded(b[j], 8)[0] for b in batches])
        for j in range(3)
    )
    scores = tuple(
        np.concatenate([_to_padded(b[j], 8)[1] for b in batches])
        for j in range(3)
    )
    rows_o, scores_o = fuse_topk_many(rows, scores, kind="rrf", param=60.0)
    for i, b in enumerate(batches):
        got = _from_padded(rows_o[i:i + 1], scores_o[i:i + 1])
        expected = host.fuse_many(b)
        assert [r for r, _ in got] == [r for r, _ in expected]


def test_fuse_topk_many_union_interior_holes_matches_fuse_topk():
    """Post-tag-filter candidate lists carry interior invalid slots;
    union's rank-offset key space must still match the two-list op
    exactly (ADVICE r2: the kmax-based offset diverged)."""
    from trueno_rag_tpu.ops.fusion import fuse_topk, fuse_topk_many

    rd = np.array([[5, -1, 7, -1, 9, 3]], np.int32)
    sd = np.array([[0.9, -np.inf, 0.7, -np.inf, 0.5, 0.4]], np.float32)
    rs = np.array([[7, -1, 2, 8, -1, 1]], np.int32)
    ss = np.array([[0.8, -np.inf, 0.6, 0.55, -np.inf, 0.1]], np.float32)
    r1, s1 = fuse_topk(rd, sd, rs, ss, kind="union", param=0.0)
    r2, s2 = fuse_topk_many((rd, rs), (sd, ss), kind="union", param=0.0)
    assert np.array_equal(np.asarray(r1), np.asarray(r2))
    assert np.array_equal(np.asarray(s1), np.asarray(s2))

    # randomized hole patterns, several widths
    rng = np.random.Generator(np.random.PCG64(11))
    for _ in range(20):
        kd, ks = int(rng.integers(1, 7)), int(rng.integers(1, 7))
        rd = rng.choice(12, size=(1, kd), replace=False).astype(np.int32)
        rs = rng.choice(12, size=(1, ks), replace=False).astype(np.int32)
        sd = np.sort(rng.random((1, kd)).astype(np.float32))[:, ::-1].copy()
        ss = np.sort(rng.random((1, ks)).astype(np.float32))[:, ::-1].copy()
        hole_d = rng.random((1, kd)) < 0.35
        hole_s = rng.random((1, ks)) < 0.35
        rd[hole_d], sd[hole_d] = -1, -np.inf
        rs[hole_s], ss[hole_s] = -1, -np.inf
        r1, s1 = fuse_topk(rd, sd, rs, ss, kind="union", param=0.0)
        r2, s2 = fuse_topk_many((rd, rs), (sd, ss), kind="union", param=0.0)
        assert np.array_equal(np.asarray(r1), np.asarray(r2)), (rd, rs)
        assert np.array_equal(np.asarray(s1), np.asarray(s2)), (rd, rs)
