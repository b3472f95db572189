"""Tri-hybrid retrieval: dense + BM25 + learned-sparse fused N-way.

Demonstrates the learned-sparse source COMPOSED with the classic
hybrid (the reference's only sparse path is BM25, index.rs:30-280):
attach, 3-way fusion with per-source scores, tag filters, artifact
round-trip, and the sharded tri index on an 8-device CPU mesh.
Run: PYTHONPATH=. JAX_PLATFORMS=cpu python examples/tri_hybrid.py
"""

import os
import tempfile

import jax

if not jax.config.jax_platforms:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import trueno_rag_tpu as rag
from trueno_rag_tpu.chunking import RecursiveChunker
from trueno_rag_tpu.models.splade import SpladeEncoder
from trueno_rag_tpu.retrieve import TagFilter

# --- 1. a hybrid retriever, then a learned third source ---------------------
emb = rag.MockEmbedder(dimension=64)
retr = rag.HybridRetriever(emb)

docs = [
    rag.Document(
        "TPU pods scale retrieval with ICI collectives over sharded meshes. "
        "Each chip scans its own corpus shard and the top-k merge rides the "
        "interconnect.", title="tpu-scaling"),
    rag.Document(
        "BM25 ranks documents by term frequency, inverse document frequency "
        "and length normalization. It is the classic sparse baseline.",
        title="bm25"),
    rag.Document(
        "SPLADE expands texts into weighted vocabulary terms with a tied "
        "masked-language-model head, bridging lexical and semantic search.",
        title="splade"),
    rag.Document(
        "Dense bi-encoders embed queries and chunks into one vector space; "
        "exact top-k is a matmul plus a streaming selection kernel.",
        title="dense"),
]
chunker = RecursiveChunker(chunk_size=160, overlap=20)
chunks = [c for d in docs for c in chunker.chunk(d)]
emb.embed_chunks(chunks)
retr.index_batch(chunks)

retr.attach_learned_sparse(SpladeEncoder(seed=0, max_len=48))  # back-fills
print(f"tri-hybrid over {len(retr.registry)} chunks "
      f"({len(retr.learned_index)} learned expansions)")

# --- 2. three candidate sets, one N-way device fusion -----------------------
hits = retr.retrieve("weighted vocabulary expansion search", 3)
assert hits and hits[0].fused_score is not None
for h in hits:
    print(f"  [{h.best_score():.4f}] {h.chunk.metadata.title}"
          f" dense={h.dense_score is not None}"
          f" bm25={h.sparse_score is not None}"
          f" learned={h.learned_score is not None}")

# --- 3. tag filters ride every source's native mechanism --------------------
for i, c in enumerate(chunks):
    retr.registry.set_tags(c.id, ["even" if i % 2 == 0 else "odd"])
filt = retr.retrieve("sparse lexical ranking", 3, tag_filter=TagFilter(all=["even"]))
rows = [retr.registry.row_of(h.chunk.id) for h in filt]
assert filt and all(r % 2 == 0 for r in rows)
print("  filtered(all=even) ->", [h.chunk.metadata.title for h in filt])

# --- 4. the expansions persist INSIDE the hybrid artifact -------------------
from trueno_rag_tpu.persist import load_index, read_index_info, save_index

with tempfile.TemporaryDirectory() as d:
    path = os.path.join(d, "tri.trag")
    save_index(path, retr)
    meta = read_index_info(path)["learned"]
    enc = SpladeEncoder(seed=0, max_len=int(meta["max_len"]),
                        doc_top=int(meta["doc_top"]),
                        query_top=int(meta["query_top"]))
    loaded, _ = load_index(path, rag.MockEmbedder(dimension=64),
                           learned_encoder=enc)
    q = "weighted vocabulary expansion search"
    a = [(h.chunk.id, h.fused_score) for h in retr.retrieve(q, 3)]
    b = [(h.chunk.id, h.fused_score) for h in loaded.retrieve(q, 3)]
    assert a == b
    print("artifact round-trip ok (learned scores identical)")

# --- 5. the same tri index on an 8-device mesh ------------------------------
from trueno_rag_tpu.parallel.hybrid import ShardedHybridIndex
from trueno_rag_tpu.parallel.mesh import create_mesh

mesh = create_mesh(data=8, model=1)
sharded = ShardedHybridIndex(retr, mesh, sparse_mode="replicated")
assert sharded.learned is not None
single = [h.chunk.id for h in retr.retrieve(q, 3)]
multi = [h.chunk.id for h in sharded.search(q, 3)]
assert multi == single
print(f"sharded tri parity ok on {mesh.shape} "
      f"(learned shard postings {sharded.learned.max_shard_postings}/"
      f"{sharded.learned.total_postings})")
print("tri-hybrid example OK")
