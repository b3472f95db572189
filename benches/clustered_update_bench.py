"""Mutation→ready latency of the clustered tier: incremental vs re-cluster.

The clustered tier couples every row to a k-means tile, so before
incremental maintenance ANY mutation re-clustered the corpus on the
next query. This bench measures what a serving process actually
experiences after a small mutation batch (``ensure_ready`` — the
mutation→ready work, no query attached):

- **incremental** (`cluster_incremental_limit` > 0, the default): the
  dirty rows fold into the existing layout (hole placement + radius
  widening + replica scatter) — milliseconds.
- **re-cluster** (`cluster_incremental_limit=0`, the pre-feature
  behavior): the next refresh re-runs k-means + the full replica prep.

Two mutation rounds per phase with identical shapes; round 2 is the
reported steady state (round 1 additionally pays the one-time XLA
compiles of the scatter/prep programs). Results stay EXACT either way
(certified sets or the host patch); the bench asserts parity against a
plain fp32 store after every round and reports the certified fraction
before/after the updates — the selectivity drift the
`cluster_incremental_limit` budget caps.

Corpus shape: one blob per tile, each blob carrying exactly ``k``
planted near-duplicates of its center (the certifiable regime the
clustered tier serves — top-k of a homogeneous 1000-row blob is
rank-ambiguous within the rescore intervals and correctly fails
closed; see benches/clustered_bench.py's --planted for the same
construction).

Run on CPU by default (PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu): the
store-level path ships the corpus host→device, which over this box's
~2 MB/s TPU tunnel would measure the tunnel, not the work (CLAUDE.md).
The re-cluster side's device k-means measured ~20 s at 1M×384 on a
real v5e (`benches/clustered_bench.py` / docs/architecture.md); the
incremental side ships only the mutated rows regardless of platform.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=262_144)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--tile-n", type=int, default=1024)
    p.add_argument("--probe", type=int, default=8)
    p.add_argument("--updates", type=int, default=128,
                   help="inserted rows per mutation round (plus 1 remove + 1 replace)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--sigma", type=float, default=0.04)
    args = p.parse_args()
    # one natural blob per tile. The balanced layout has exactly
    # ceil(live/tile_n) tiles with hard capacity tile_n, so tight
    # certifiable tiles need BOTH (a) every natural cluster to fit one
    # tile (an oversized cluster sprays its overflow into other blobs'
    # tiles — measured: 224 blobs of ~1170 rows over 256 tiles gave
    # median radius 1.23 vs 0.45 and certification 0/8) and (b) at
    # least as many tiles as clusters — which together force the hole
    # budget UNDER one tile (a 1% drop at 262k shrank t by 2 and left
    # two blobs homeless, same pollution). Real corpora are not this
    # adversarial; the bench wants the certifiable regime.
    blobs = max(1, args.n // args.tile_n)

    from trueno_rag_tpu.chunking import Chunk, ChunkMetadata
    from trueno_rag_tpu.index import VectorStore, VectorStoreConfig

    rng = np.random.default_rng(0)
    centers = rng.standard_normal((blobs, args.d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    per = -(-args.n // blobs)
    which = np.repeat(np.arange(blobs), per)[: args.n]
    # exactly k planted: the runner-up is a pack row with a robust gap,
    # so certification hinges on the store's t_top runner-up slack (a
    # k+2 construction is rank-ambiguous at the k/k+1 boundary within
    # the fp32 rescore interval and certifies only per random draw)
    sig = np.where(np.arange(args.n) % per < args.k, 0.005, args.sigma)
    m = centers[which] + sig[:, None] * rng.standard_normal(
        (args.n, args.d)).astype(np.float32)
    m = m.astype(np.float32)

    # leave holes WHERE THE INSERTS WILL LAND: the incremental path
    # places an insert in its best-scoring tile that still has a hole,
    # and the re-cluster path needs every blob (original + inserts) to
    # fit one tile — so drop (inserts+1) PACK rows from exactly the
    # blobs the mutation rounds target. Random holes measured both
    # failure modes at 262k: ~2 holes/tile strands inserts in foreign
    # tiles (radius blows up, incremental certified 0/8) and capacity-
    # exact blobs overflow the re-clustered layout (same 0/8). Total
    # drops must stay under one tile or the tile count shrinks below
    # the blob count and the balanced spill pollutes tiles corpus-wide.
    rounds = 2
    insert_counts = np.zeros(blobs, dtype=int)
    for i in range(args.updates):
        insert_counts[i % blobs] += rounds
    drop_per_blob = np.where(insert_counts > 0, insert_counts + 1, 0)
    total_drops = int(drop_per_blob.sum())
    if total_drops >= args.tile_n:
        raise SystemExit(
            f"hole budget {total_drops} >= tile_n {args.tile_n}: lower "
            f"--updates or raise --tile-n (see corpus-shape comment)")
    live = np.ones(args.n, dtype=bool)
    for b in range(blobs):
        if drop_per_blob[b]:
            hi = min((b + 1) * per, args.n)
            live[hi - drop_per_blob[b]: hi] = False
    # c17/c23 (blob-0 pack rows, away from the drop zone) stay live —
    # the mutation rounds remove/replace them by id
    assert live[17] and live[23]
    chunks = [
        Chunk(id=f"c{i}", document_id="d", content=f"chunk {i}",
              start_offset=0, end_offset=7, metadata=ChunkMetadata(),
              embedding=m[i])
        for i in range(args.n) if live[i]
    ]
    queries = centers[
        rng.choice(blobs, size=args.batch, replace=False)
    ].astype(np.float32)

    plain = VectorStore(VectorStoreConfig(dimension=args.d))
    plain.insert_many(chunks)

    def check_parity(store, label):
        # SET equality: the certificate proves the exact top-k set; the
        # in-set order of planted near-duplicates can differ from the
        # fp32 store's at ~1e-7 rescore rounding
        for q in queries[:4]:
            got = store.search(q, args.k)
            want = plain.search(q, args.k)
            assert {g[0] for g in got} == {w[0] for w in want}, label

    def certified_frac(store):
        before = store.compact_uncertified
        store.search_arrays(queries, args.k)
        return 1.0 - (store.compact_uncertified - before) / len(queries)

    def mutate(stores, tag):
        """Apply one identical mutation round to every store in `stores`:
        `updates` inserts near centers, one remove, one replace."""
        new = []
        for i in range(args.updates):
            c = Chunk(id=f"{tag}{i}", document_id="d", content="new",
                      start_offset=0, end_offset=3, metadata=ChunkMetadata(),
                      embedding=(centers[i % blobs]
                                 + 0.03 * rng.standard_normal(args.d)
                                 ).astype(np.float32))
            new.append(c)
        for s in stores:
            for c in new:
                s.insert(c)
            s.remove("c17")
            rep = Chunk(id="c23", document_id="d", content="rep",
                        start_offset=0, end_offset=3,
                        metadata=ChunkMetadata(), embedding=m[23])
            s.insert(rep)
        return [c.id for c in new]

    results = {}
    for label, limit in (("incremental", 0.1), ("re-cluster", 0.0)):
        store = VectorStore(VectorStoreConfig(
            dimension=args.d, scan_tier="clustered", scan_tile_n=args.tile_n,
            cluster_probe_tiles=args.probe, cluster_incremental_limit=limit,
        ))
        store.insert_many(chunks)
        t0 = time.perf_counter()
        store.ensure_ready()
        t_build = time.perf_counter() - t0
        cert_before = certified_frac(store)
        check_parity(store, f"{label}: pre-mutation")

        times = []
        inserted = []
        for rnd in range(2):
            inserted += mutate([store, plain], f"{label[0]}{rnd}_")
            t0 = time.perf_counter()
            store.ensure_ready()  # the mutation->ready work, no query cost
            times.append(time.perf_counter() - t0)
            check_parity(store, f"{label}: round {rnd}")
        cert_after = certified_frac(store)
        results[label] = times[1]
        print(f"{label:12s} first-build {t_build:7.2f} s   "
              f"mutation->ready {times[0] * 1e3:9.1f} ms (cold) "
              f"{times[1] * 1e3:9.1f} ms (warm)   "
              f"certified {cert_before:.2f} -> {cert_after:.2f}")
        # restore plain to the original corpus for the next phase
        for cid in inserted:
            plain.remove(cid)
        for row in (17, 23):
            plain.remove(f"c{row}")
            c = Chunk(id=f"c{row}", document_id="d", content=f"chunk {row}",
                      start_offset=0, end_offset=7, metadata=ChunkMetadata(),
                      embedding=m[row])
            plain.insert(c)

    inc, full = results["incremental"], results["re-cluster"]
    print(f"\nmutation->ready speedup: {full / inc:.0f}x "
          f"({full:.2f} s re-cluster vs {inc * 1e3:.1f} ms incremental, "
          f"{args.updates + 2} mutated rows/round, N={args.n})")


if __name__ == "__main__":
    main()
