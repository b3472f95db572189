"""Cluster-pruned certified tier: pruning must never cost exactness —
certified queries return the PROVABLY exact top-k set over the FULL
corpus even though only the probed tile union was scanned; pruning
misses fail the certificate (fail-closed), never drop rows silently."""

import numpy as np

import jax.numpy as jnp

from trueno_rag_tpu.ops.clustered import (
    apply_cluster_order,
    dense_topk_compact_bf16r_clustered,
    prepare_clustered,
)
from trueno_rag_tpu.ops.dense import dense_topk
from trueno_rag_tpu.ops.dense_tiered import prepare_residual, prepare_tiered

TILE = 1024  # == the kernel's SEL floor; smallest legal tile


def _blob_corpus(n=16_000, d=32, blobs=24, seed=0, sigma=0.15, balanced=False):
    """Mixture of Gaussians on the sphere — the clustered structure real
    embedding corpora have (and the reason pruning pays).

    ``balanced=True`` gives every blob exactly ``n // blobs`` rows (so a
    blob fits one tile and k-means can recover a tight radius);
    ``sigma`` trades intra-blob rank gaps (certifiability) against
    cluster tightness (pruning bound quality)."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((blobs, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    if balanced:
        which = np.repeat(np.arange(blobs), n // blobs)[:n]
    else:
        which = rng.integers(0, blobs, size=n)
    m = centers[which] + sigma * rng.standard_normal((n, d)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return m.astype(np.float32), centers


def _layout(m, order):
    mp = apply_cluster_order(m, order, fill=0).astype(np.float32)
    valid = np.asarray(order >= 0)
    parts = prepare_tiered(jnp.asarray(mp)) + prepare_residual(jnp.asarray(mp))
    return mp, parts, jnp.asarray(valid)


def _run(m, queries, k, probe, order, cent, radii, tags=None, **kw):
    _, parts, valid = _layout(m, order)
    return dense_topk_compact_bf16r_clustered(
        jnp.asarray(queries), *parts, valid, k,
        jnp.asarray(cent), jnp.asarray(radii), probe_tiles=probe,
        row_map=jnp.asarray(order), tile_n=TILE, interpret=True,
        return_stats=True, tags=tags, **kw,
    )


def test_certified_sets_exact_and_pruned():
    """The serving pattern pruning exists for: topical blobs (one per
    tile — coherent clusters, tight radii, real exclusion margins) with
    a handful of PLANTED highly-relevant rows per topic whose scores
    clear the blob mass by far more than the scan interval — every
    query should certify while scanning a fraction of the tiles."""
    n, d, blobs, k, planted = 16_000, 128, 16, 5, 5
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((blobs, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    which = np.repeat(np.arange(blobs), n // blobs)
    m = centers[which] + 0.05 * rng.standard_normal((n, d)).astype(np.float32)
    # plant `planted` near-duplicates of each center as its true top-k
    for bidx in range(blobs):
        rows = np.flatnonzero(which == bidx)[:planted]
        m[rows] = centers[bidx] + 0.01 * rng.standard_normal((planted, d)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    m = m.astype(np.float32)

    order, cent, radii = prepare_clustered(m, tile_n=TILE, iters=8, sample=8192)
    t = len(radii)
    assert t == 16 and (order >= -1).all()
    # every original row appears exactly once
    present = order[order >= 0]
    assert len(np.unique(present)) == len(present) == n
    assert np.median(radii) < 0.8, f"k-means failed to recover blobs: {radii}"

    queries = centers[:4].astype(np.float32)
    probe = 4
    s, r, ok, n_scanned = _run(m, queries, k, probe, order, cent, radii)
    ok = np.asarray(ok).astype(bool)
    r = np.asarray(r)
    assert int(n_scanned) <= min(t, 4 * probe)
    assert int(n_scanned) < t, "pruning scanned everything"
    assert ok.all(), f"expected full certification, got {ok}"

    sx, rx = dense_topk(jnp.asarray(queries), jnp.asarray(m),
                        jnp.ones(m.shape[0], bool), k, "cosine")
    rx = np.asarray(rx)
    for i in np.flatnonzero(ok):
        assert set(r[i].tolist()) == set(rx[i].tolist()), f"query {i}"


def test_fail_closed_on_tight_probe():
    """probe_tiles=1 starves the probe set: whatever certifies must
    still be exact (the unscanned-tile bound joins the threshold)."""
    m, centers = _blob_corpus(seed=3)
    order, cent, radii = prepare_clustered(m, tile_n=TILE, iters=4, sample=4096)
    rng = np.random.default_rng(4)
    # adversarial queries BETWEEN blobs: their top-k straddles tiles
    queries = rng.standard_normal((4, m.shape[1])).astype(np.float32)
    s, r, ok, _ = _run(m, queries, 5, 1, order, cent, radii)
    ok = np.asarray(ok).astype(bool)
    r = np.asarray(r)
    sx, rx = dense_topk(jnp.asarray(queries), jnp.asarray(m),
                        jnp.ones(m.shape[0], bool), 5, "cosine")
    rx = np.asarray(rx)
    for i in np.flatnonzero(ok):
        assert set(r[i].tolist()) == set(rx[i].tolist())


def test_holes_never_surface():
    m, centers = _blob_corpus(n=15_500)  # 16 tiles with 884 holes
    order, cent, radii = prepare_clustered(m, tile_n=TILE, iters=4, sample=4096)
    assert (order == -1).sum() == 16 * TILE - 15_500
    queries = centers[:2].astype(np.float32)
    s, r, ok, _ = _run(m, queries, 5, 3, order, cent, radii)
    r = np.asarray(r)
    assert r.max() < 15_500 and (r[r >= 0] >= 0).all()
    sx, rx = dense_topk(jnp.asarray(queries), jnp.asarray(m),
                        jnp.ones(m.shape[0], bool), 5, "cosine")
    rx = np.asarray(rx)
    for i in np.flatnonzero(np.asarray(ok).astype(bool)):
        assert set(r[i].tolist()) == set(np.asarray(rx)[i].tolist())


def test_tag_filter_rides_pruned_scan():
    m, centers = _blob_corpus(seed=7)
    order, cent, radii = prepare_clustered(m, tile_n=TILE, iters=4, sample=4096)
    n = m.shape[0]
    rng = np.random.default_rng(8)
    tag_bits = rng.integers(0, 4, size=n).astype(np.int32)
    tag_perm = apply_cluster_order(tag_bits, order, fill=0)
    b = 3
    queries = centers[:b].astype(np.float32)
    tags = (
        jnp.asarray(tag_perm),
        jnp.full((b,), 1, jnp.int32),  # require bit0
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), jnp.int32),
    )
    s, r, ok, _ = _run(m, queries, 5, 4, order, cent, radii, tags=tags)
    ok = np.asarray(ok).astype(bool)
    r = np.asarray(r)
    allowed = (tag_bits & 1) != 0
    for i in range(b):
        rows = [x for x in r[i].tolist() if x >= 0]
        assert all(allowed[x] for x in rows), "filter leaked"
    sx, rx = dense_topk(jnp.asarray(queries), jnp.asarray(m),
                        jnp.asarray(allowed), 5, "cosine")
    rx = np.asarray(rx)
    for i in np.flatnonzero(ok):
        assert set(r[i].tolist()) == set(rx[i].tolist())


def test_dma_fetch_matches_gather():
    """The scalar-prefetch selective-DMA scan and the XLA gather-then-
    scan must be interchangeable: same rows, scores, certificates —
    with and without tag filters."""
    m, centers = _blob_corpus(seed=13)
    order, cent, radii = prepare_clustered(m, tile_n=TILE, iters=4, sample=4096)
    n = m.shape[0]
    rng = np.random.default_rng(14)
    tag_bits = apply_cluster_order(
        rng.integers(0, 4, size=n).astype(np.int32), order, fill=0
    )
    queries = centers[:3].astype(np.float32)
    b = queries.shape[0]
    tags = (
        jnp.asarray(tag_bits),
        jnp.full((b,), 1, jnp.int32),
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), jnp.int32),
    )
    for tg in (None, tags):
        g = _run(m, queries, 5, 3, order, cent, radii, tags=tg, fetch="gather")
        d_ = _run(m, queries, 5, 3, order, cent, radii, tags=tg, fetch="dma")
        for a, bb in zip(g, d_):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))


def test_full_probe_equals_compact_tier():
    """probe_tiles=T disables pruning: results must match the plain
    compact tier on the same layout (same kernel, same tail)."""
    from trueno_rag_tpu.ops.dense_tiered import dense_topk_compact_bf16r

    m, centers = _blob_corpus(seed=11)
    order, cent, radii = prepare_clustered(m, tile_n=TILE, iters=4, sample=4096)
    mp, parts, valid = _layout(m, order)
    queries = jnp.asarray(centers[:2].astype(np.float32))
    s1, r1, ok1, n_sc = _run(m, np.asarray(queries), 5, 16, order, cent, radii)
    assert int(n_sc) == 16
    s2, r2, ok2 = dense_topk_compact_bf16r(
        queries, *parts, valid, 5, tile_n=TILE, interpret=True, t_top=8,
    )
    # translate the compact tier's clustered-layout rows for comparison
    r2 = np.asarray(r2)
    r2t = np.where(r2 >= 0, order[np.clip(r2, 0, len(order) - 1)], r2)
    np.testing.assert_array_equal(np.asarray(r1), r2t)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)
    # pruning with full probe can only ADD -inf bounds nothing: same certs
    np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok2))


# -- property: certification is fail-closed on ARBITRARY data --------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=6, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    structure=st.sampled_from(["blobs", "random", "duplicates"]),
    probe=st.integers(1, 4),
    k=st.integers(1, 8),
)
def test_property_certified_always_exact(seed, structure, probe, k):
    """Whatever the data (clustered, structureless, or pathological
    duplicate-heavy), whatever the probe budget: a certified query's
    set must equal the fp32 oracle's. Uncertified is always allowed —
    never a wrong certificate."""
    rng = np.random.default_rng(seed)
    n, d = 3 * TILE, 24
    if structure == "blobs":
        centers = rng.standard_normal((3, d)).astype(np.float32)
        m = centers[np.repeat(np.arange(3), n // 3)] + 0.1 * rng.standard_normal(
            (n, d)
        ).astype(np.float32)
    elif structure == "random":
        m = rng.standard_normal((n, d)).astype(np.float32)
    else:  # heavy exact duplicates: ties everywhere
        base = rng.standard_normal((64, d)).astype(np.float32)
        m = base[rng.integers(0, 64, size=n)]
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    m = (m / np.where(norms == 0, 1.0, norms)).astype(np.float32)

    order, cent, radii = prepare_clustered(m, tile_n=TILE, iters=3, sample=2048,
                                           seed=seed)
    queries = m[rng.integers(0, n, size=2)] + 0.01 * rng.standard_normal(
        (2, d)
    ).astype(np.float32)
    s, r, ok, _ = _run(m, queries, k, probe, order, cent, radii)
    ok = np.asarray(ok).astype(bool)
    if not ok.any():
        return  # fail-closed is always acceptable
    r = np.asarray(r)
    q = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sc = q.astype(np.float64) @ m.astype(np.float64).T
    for i in np.flatnonzero(ok):
        got = set(x for x in r[i].tolist() if x >= 0)
        # certified set semantics: every selected row's true score must
        # strictly beat every excluded row's (ties must fail closed),
        # which equals "top-k set" whenever scores are distinct at the
        # boundary — check the set-dominance form to stay tie-robust
        if not got:
            continue
        worst_in = min(sc[i][list(got)])
        rest = np.delete(sc[i], list(got))
        assert worst_in > rest.max() - 1e-12, (
            f"certified set not dominant (seed={seed}, {structure})"
        )


# --- device-resident build (prepare_clustered_device) ----------------------


def test_device_prep_contract_and_sound_radii():
    """The device prep returns the same (order, centroids, radii)
    contract and its radii remain SOUND upper bounds on the true f64
    row-centroid distances (build-side f32 evaluation is widened by
    _DEV_RADIUS_SLACK before the standard query-side slack)."""
    from trueno_rag_tpu.ops.clustered import prepare_clustered_device

    m, _ = _blob_corpus(n=4096, d=32, blobs=4, balanced=True, sigma=0.1)
    order, cent, radii = prepare_clustered_device(
        jnp.asarray(m), tile_n=TILE, iters=4, sample=2048)
    t = len(radii)
    assert len(order) == t * TILE
    live = order[order >= 0]
    assert len(np.unique(live)) == len(live) == len(m)
    for c in range(t):
        rows = order[c * TILE:(c + 1) * TILE]
        rows = rows[rows >= 0]
        if not len(rows):
            continue
        diff = m[rows].astype(np.float64) - cent[c].astype(np.float64)
        true_max = np.sqrt((diff * diff).sum(axis=1)).max()
        assert true_max <= radii[c], f"tile {c}: {true_max} > {radii[c]}"


def test_device_prep_certified_sets_exact():
    """End-to-end: device-built layout + pruned scan → certified sets
    equal the fp32 brute-force oracle (reference index.rs:386-412)."""
    from trueno_rag_tpu.ops.clustered import (
        apply_cluster_order_device,
        prepare_clustered_device,
    )

    n, d, blobs, k, planted = 16_000, 128, 16, 5, 5
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((blobs, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    which = np.repeat(np.arange(blobs), n // blobs)
    m = centers[which] + 0.05 * rng.standard_normal((n, d)).astype(np.float32)
    for bidx in range(blobs):
        rows = np.flatnonzero(which == bidx)[:planted]
        m[rows] = centers[bidx] + 0.01 * rng.standard_normal((planted, d)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    m = m.astype(np.float32)

    order, cent, radii = prepare_clustered_device(
        jnp.asarray(m), tile_n=TILE, iters=8, sample=8192)
    # device layout application matches the host path bit-for-bit
    mp_host = apply_cluster_order(m, order, fill=0).astype(np.float32)
    mp_dev = np.asarray(apply_cluster_order_device(jnp.asarray(m), order, fill=0))
    np.testing.assert_array_equal(mp_host, mp_dev)

    queries = centers[:4].astype(np.float32)
    s, r, ok, n_scanned = _run(m, queries, k, 4, order, cent, radii)
    ok = np.asarray(ok).astype(bool)
    r = np.asarray(r)
    t = len(radii)
    assert int(n_scanned) < t, "pruning scanned everything"
    assert ok.all(), f"expected full certification, got {ok}"
    sx, rx = dense_topk(jnp.asarray(queries), jnp.asarray(m),
                        jnp.ones(m.shape[0], bool), k, "cosine")
    rx = np.asarray(rx)
    for i in np.flatnonzero(ok):
        assert set(r[i].tolist()) == set(rx[i].tolist()), f"query {i}"


def test_device_prep_valid_holes():
    """Invalid rows become holes (never clustered, never surfaced),
    exactly like the host path's valid= handling."""
    from trueno_rag_tpu.ops.clustered import prepare_clustered_device

    m, centers = _blob_corpus(n=4096, d=32, blobs=4, balanced=True, sigma=0.1)
    valid = np.ones(len(m), bool)
    valid[::7] = False
    order, cent, radii = prepare_clustered_device(
        jnp.asarray(m), tile_n=TILE, iters=3, sample=2048, valid=valid)
    live = order[order >= 0]
    assert len(np.unique(live)) == len(live) == int(valid.sum())
    assert not np.isin(np.flatnonzero(~valid), live).any()
    queries = centers[:2].astype(np.float32)
    s, r, ok, _ = _run(m, queries, 5, 3, order, cent, radii)
    r = np.asarray(r)
    assert not np.isin(r[r >= 0], np.flatnonzero(~valid)).any()


def test_apply_cluster_order_device_matches_host():
    rng = np.random.default_rng(5)
    arr2 = rng.standard_normal((37, 8)).astype(np.float32)
    arr1 = rng.standard_normal(37).astype(np.float32)
    order = np.full(48, -1, np.int32)
    perm = rng.permutation(37)
    order[rng.choice(48, size=37, replace=False)] = perm
    for arr in (arr1, arr2):
        from trueno_rag_tpu.ops.clustered import apply_cluster_order_device

        host = apply_cluster_order(arr, order, fill=0)
        dev = np.asarray(apply_cluster_order_device(jnp.asarray(arr), order, fill=0))
        np.testing.assert_array_equal(host, dev)


# --- streaming build (prepare_clustered_stream) -----------------------------


def test_stream_prep_matches_device_prep():
    """A gather row-source over a resident matrix must reproduce the
    device prep exactly (prepare_clustered_device IS the stream prep
    with slice reads; take and dynamic_slice return identical values)."""
    from trueno_rag_tpu.ops.clustered import (
        prepare_clustered_device,
        prepare_clustered_stream,
    )

    m, _ = _blob_corpus(n=4096, d=32, blobs=4, balanced=True, sigma=0.1)
    mj = jnp.asarray(m)
    o1, c1, r1 = prepare_clustered_device(mj, tile_n=TILE, iters=4, sample=2048)
    o2, c2, r2 = prepare_clustered_stream(
        lambda ids: jnp.take(mj, jnp.asarray(ids, jnp.int32), axis=0),
        len(m), m.shape[1], tile_n=TILE, iters=4, sample=2048)
    np.testing.assert_array_equal(o1, o2)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(r1, r2)


def test_stream_prep_recon_err_sound_radii():
    """An APPROXIMATE row source (x̂ = x + bounded noise) with the
    matching recon_err still publishes radii that soundly bound the
    TRUE rows' f64 distances to the published centroids — the property
    the pruned-tile certificate rests on."""
    from trueno_rag_tpu.ops.clustered import prepare_clustered_stream

    m, _ = _blob_corpus(n=4096, d=32, blobs=4, balanced=True, sigma=0.1)
    rng = np.random.default_rng(3)
    noise = rng.standard_normal(m.shape).astype(np.float32)
    noise *= 0.01 / np.linalg.norm(noise, axis=1, keepdims=True)  # ‖e‖=0.01
    m_hat = jnp.asarray(m + noise)
    order, cent, radii = prepare_clustered_stream(
        lambda ids: jnp.take(m_hat, jnp.asarray(ids, jnp.int32), axis=0),
        len(m), m.shape[1], tile_n=TILE, iters=4, sample=2048,
        recon_err=0.01)
    for c in range(len(radii)):
        rows = order[c * TILE:(c + 1) * TILE]
        rows = rows[rows >= 0]
        if not len(rows):
            continue
        diff = m[rows].astype(np.float64) - cent[c].astype(np.float64)
        true_max = np.sqrt((diff * diff).sum(axis=1)).max()
        assert true_max <= radii[c], f"tile {c}: {true_max} > {radii[c]}"


def test_stream_prep_generator_source_end_to_end():
    """A row source that GENERATES rows from ids (no matrix anywhere,
    the 10M-bench pattern) → certified sets equal the fp32 oracle."""
    import jax

    from trueno_rag_tpu.ops.clustered import prepare_clustered_stream

    n, d, blobs, k, planted = 8192, 64, 8, 5, 5
    per = n // blobs
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((blobs, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    centers_j = jnp.asarray(centers)
    key = jax.random.PRNGKey(42)

    @jax.jit
    def gen(ids):
        ids = jnp.maximum(ids, 0)
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(ids)
        noise = jax.vmap(lambda kk: jax.random.normal(kk, (d,)))(keys)
        which = jnp.minimum(ids // per, blobs - 1)
        sig = jnp.where(ids % per < planted, 0.01, 0.05)[:, None]
        rows = jnp.take(centers_j, which, axis=0) + sig * noise
        return rows / jnp.linalg.norm(rows, axis=1, keepdims=True)

    def row_source(ids):
        return gen(jnp.asarray(np.asarray(ids), jnp.int32))

    order, cent, radii = prepare_clustered_stream(
        row_source, n, d, tile_n=TILE, iters=6, sample=4096)
    live = order[order >= 0]
    assert len(np.unique(live)) == len(live) == n

    # materialize (test-only) to reuse the shared runner + oracle
    m = np.asarray(row_source(np.arange(n)), dtype=np.float32)
    queries = centers[:4].astype(np.float32)
    s, r, ok, n_scanned = _run(m, queries, k, 3, order, cent, radii)
    ok = np.asarray(ok).astype(bool)
    assert int(n_scanned) < len(radii), "pruning scanned everything"
    assert ok.any(), "expected at least one certified query"
    _, rx = dense_topk(jnp.asarray(queries), jnp.asarray(m),
                       jnp.ones(n, bool), k, "cosine")
    rx = np.asarray(rx)
    r = np.asarray(r)
    for i in np.flatnonzero(ok):
        assert set(r[i].tolist()) == set(rx[i].tolist()), f"query {i}"
