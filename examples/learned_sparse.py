"""Learned-sparse (SPLADE-class) retrieval: train a vocabulary
expansion model, index expansions, and search through the weighted
block-gather device path.

The reference's only sparse retrieval is BM25 over surface tokens
(reference: index.rs:30-280). A SPLADE-class model EXPANDS each text
into weighted vocabulary terms — synonyms and related words score even
when the surface forms differ — while exact matches keep their lexical
precision. The flow here:

1. Train the expansion head with in-batch InfoNCE + the FLOPS
   regularizer (one jitted step; the regularizer drives activations
   sparse, which is what keeps the posting lists short).
2. Index documents: one encoder forward each, top-T activations become
   (term, weight) postings in a `LearnedSparseIndex`.
3. Retrieve: one encoder forward per query + a candidate-space weighted
   block gather (`ops/bm25.weighted_topk_blocks`) — the same
   measured-fast fetch plan as the BM25 device path.
4. Persist + reload the artifact; scores are identical.

Run: PYTHONPATH=. PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python examples/learned_sparse.py
"""

import functools

import jax
import jax.numpy as jnp

from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
from trueno_rag_tpu.models.encoder import EncoderConfig, HashTokenizer
from trueno_rag_tpu.models.splade import SpladeRetriever, init_splade_params
from trueno_rag_tpu.train.contrastive import (
    TrainState,
    create_optimizer,
    splade_train_step,
)

# --- 1. a tiny training run on synthetic pairs -----------------------------
cfg = EncoderConfig.tiny()
tok = HashTokenizer(cfg.vocab_size, 16)
words = [f"term{i}" for i in range(48)]
pairs = [
    (f"{words[i]} {words[(i + 1) % 48]}",
     f"{words[i]} {words[(i + 1) % 48]} {words[(i + 2) % 48]}")
    for i in range(24)
]
q_ids = jnp.asarray(tok.encode_batch([q for q, _ in pairs]))
d_ids = jnp.asarray(tok.encode_batch([d for _, d in pairs]))

params = init_splade_params(jax.random.PRNGKey(0), cfg)
tx = create_optimizer(learning_rate=3e-4)
state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
step = jax.jit(functools.partial(splade_train_step, tx=tx, config=cfg))
for i in range(30):
    state, metrics = step(state, q_ids, d_ids)
print(
    f"trained 30 steps: loss={float(metrics['loss']):.3f} "
    f"acc={float(metrics['accuracy']):.2f} "
    f"mean expansion width q/d = {float(metrics['nnz_q']):.0f}/"
    f"{float(metrics['nnz_d']):.0f} of V={cfg.vocab_size}"
)

# --- 2. index the trained corpus side --------------------------------------
retr = SpladeRetriever(config=cfg, params=state.params, doc_top=64, query_top=16)
chunks = [
    Chunk(document_id="doc", content=d, start_offset=0, end_offset=len(d),
          metadata=ChunkMetadata(title=f"t{i}"), id=chunk_id_from_int(i))
    for i, (_, d) in enumerate(pairs)
]
retr.index_batch(chunks)
print(f"indexed {len(retr)} chunks")

# --- 3. retrieve: training queries find their paired documents --------------
queries = [q for q, _ in pairs]
results = retr.retrieve_batch(queries, k=1)
top1 = sum(res[0].chunk.id == chunks[i].id for i, res in enumerate(results))
print(f"  trained model: top-1 paired-doc hit rate {top1}/{len(pairs)}")
assert top1 >= len(pairs) - 2, "training should make pairs retrievable"
hits = retr.retrieve(queries[0], k=2)
print(f"  {queries[0]!r} ->",
      [(h.chunk.content[:26], round(h.sparse_score, 3)) for h in hits])

# tag-filtered search rides the scoring op (exact filtered top-k)
from trueno_rag_tpu.retrieve import TagFilter

for i in range(0, len(chunks), 2):
    retr.registry.set_tags(chunks[i].id, ["even"])
filt = retr.retrieve(queries[0], k=3, tag_filter=TagFilter(all=["even"]))
even_ids = {chunks[i].id for i in range(0, len(chunks), 2)}
assert filt and all(h.chunk.id in even_ids for h in filt)
print("  filtered(all=even) ->", [h.chunk.metadata.title for h in filt])

# --- 4. persist + reload ----------------------------------------------------
import tempfile, os

from trueno_rag_tpu.persist import load_splade_index, save_splade_index

with tempfile.TemporaryDirectory() as d:
    path = os.path.join(d, "splade.trag")
    stats = save_splade_index(path, retr)
    loaded = load_splade_index(path, encoder_config=cfg, params=state.params)
    a = [(h.chunk.id, h.sparse_score) for h in retr.retrieve(queries[0], 3)]
    b = [(h.chunk.id, h.sparse_score) for h in loaded.retrieve(queries[0], 3)]
    assert a == b
    print(f"artifact round-trip ok ({stats['compressed_bytes']} bytes, "
          f"{stats['postings']} postings)")
print("learned-sparse example OK")
