"""Command-line interface: ``demo`` / ``index`` / ``query`` / ``info``.

Capability-equivalent to the reference CLI
(reference: crates/trueno-rag-cli/src/main.rs:68-132):

- ``info``    — version + feature-aware component list (main.rs:190-215)
- ``demo``    — TF-IDF pipeline over built-in sample texts, prints
                results + assembled context + citations (main.rs:217-281)
- ``index``   — walk .txt/.md files, chunk, embed, persist an index
                artifact (main.rs:283-427). Unlike the reference's
                pretty-printed JSON, the artifact is the compressed
                binary format from :mod:`trueno_rag_tpu.persist` and
                includes the BM25 state (the reference's persisted
                query path is dense-only, main.rs:429-525); TF-IDF
                vocabulary/idf persist too instead of being re-fit on
                load (fixing the reference's re-fit quirk,
                main.rs:468-477).
- ``query``   — load an index, run a HYBRID query, print text or JSON
                (--format text|json, main.rs:429-525).

Usage: ``python -m trueno_rag_tpu.cli <command> ...``
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import List, Optional

DEMO_TEXTS = [
    (
        "Introduction to RAG",
        "Retrieval-Augmented Generation (RAG) combines information retrieval "
        "with language model generation. Documents are chunked, embedded and "
        "indexed; at query time relevant chunks are retrieved and assembled "
        "into grounded context for the model.",
    ),
    (
        "Dense Retrieval",
        "Dense retrieval encodes text into embedding vectors and ranks "
        "documents by vector similarity such as cosine similarity. It "
        "captures semantic matches that keyword search misses.",
    ),
    (
        "Sparse Retrieval",
        "Sparse retrieval like BM25 scores documents by term frequency and "
        "inverse document frequency over an inverted index. It excels at "
        "exact keyword matching and rare terms.",
    ),
    (
        "Hybrid Search",
        "Hybrid search fuses dense and sparse rankings with strategies like "
        "reciprocal rank fusion. Fusion combines the complementary strengths "
        "of semantic and lexical retrieval for better recall.",
    ),
]


def _build_embedder(kind: str, dimension: int, model: Optional[str], seed: int = 0):
    from trueno_rag_tpu.embed import TfIdfEmbedder

    if kind == "tfidf":
        return TfIdfEmbedder(dimension)
    if kind == "semantic":
        from trueno_rag_tpu.models.encoder import EncoderConfig, JaxEncoderEmbedder

        name = model or "mini-lm"
        if os.path.isdir(name):  # local HF checkpoint directory
            import json as _json

            from trueno_rag_tpu.errors import SerializationError

            cfg_path = os.path.join(name, "config.json")
            try:
                with open(cfg_path) as f:
                    model_type = _json.load(f).get("model_type", "bert")
            except OSError as e:
                raise SerializationError(
                    f"model directory {name!r} has no readable config.json "
                    f"({e}); expected an HF checkpoint directory"
                ) from e
            except _json.JSONDecodeError as e:
                raise SerializationError(
                    f"unparseable {cfg_path!r}: {e}"
                ) from e
            if model_type in ("roformer", "nomic_bert"):
                from trueno_rag_tpu.models.hf_import import load_hf_rotary_encoder

                return load_hf_rotary_encoder(name)
            from trueno_rag_tpu.models.hf_import import load_hf_bert_encoder

            return load_hf_bert_encoder(name)
        configs = {
            "mini-lm": EncoderConfig.minilm_l6,
            "mini-lm-l12": EncoderConfig.minilm_l12,
            "bge-small": EncoderConfig.bge_small,
            "bge-base": EncoderConfig.bge_base,
            "nomic": EncoderConfig.nomic,
        }
        if name not in configs:
            raise SystemExit(f"unknown model {name!r}; choose from {sorted(configs)}")
        return JaxEncoderEmbedder(config=configs[name](), seed=seed, model_name=name)
    raise SystemExit(f"unknown embedder {kind!r}; choose tfidf or semantic")


def cmd_info(args) -> int:
    import trueno_rag_tpu as rag

    print(f"trueno-rag-tpu v{rag.__version__}")
    print()
    print("TPU-native RAG pipeline framework (JAX/XLA/Pallas)")
    try:
        import jax

        devs = jax.devices()
        print(f"devices: {len(devs)} x {devs[0].platform} ({devs[0].device_kind})")
    except Exception as e:  # device probe must never break `info`
        print(f"devices: unavailable ({type(e).__name__})")
    print()
    print("components:")
    for line in [
        "  chunking: recursive, fixed-size, sentence, paragraph, structural, semantic",
        "  embedders: mock, tfidf, jax-encoder (MiniLM/BGE-class), nemotron-class",
        "  indexes: dense vector store (HBM-resident), BM25 (device CSR scoring),",
        "           late-interaction (MaxSim token index), learned-sparse (SPLADE)",
        "  fusion: rrf, linear, convex, dbsf, union, intersection",
        "  rerankers: noop, lexical, mock-cross-encoder, neural cross-encoder, composite",
        "  context: sequential / document-grouped / interleaved assembly + citations",
        "  metrics: recall/precision/NDCG/MRR/MAP/F1/hit-rate @k + aggregation",
        "  preprocessing: hyde, multi-query, keyword/synonym expansion, analyzer",
        "  persistence: zstd/zlib compressed index artifacts, safetensors checkpoints",
        "  parallel: corpus sharding over device meshes, dp/tp encoder training",
    ]:
        print(line)
    return 0


def cmd_demo(args) -> int:
    from trueno_rag_tpu import (
        Document,
        FusionStrategy,
        LexicalReranker,
        RagPipelineBuilder,
        RecursiveChunker,
        TfIdfEmbedder,
    )

    docs = [Document(text, title=title) for title, text in DEMO_TEXTS]
    embedder = TfIdfEmbedder(128).fit([d.content for d in docs])
    pipeline = (
        RagPipelineBuilder()
        .with_embedder(embedder)
        .with_reranker(LexicalReranker())
        .with_chunker(RecursiveChunker(chunk_size=256, overlap=32))
        .with_fusion(FusionStrategy.rrf(60.0))
        .build()
    )
    n = pipeline.index_documents(docs)
    print(f"indexed {len(docs)} documents ({n} chunks)")
    query = args.query
    print(f"\nquery: {query}\n")
    results = pipeline.query(query, k=args.top_k)
    for i, r in enumerate(results, 1):
        print(f"{i}. [{r.best_score():.4f}] {r.chunk.metadata.title}: {r.chunk.content[:100]}...")
    ctx = pipeline.query_with_context(query, k=args.top_k)
    print("\n--- assembled context ---")
    print(ctx.format_with_citations())
    print("\n--- citations ---")
    print(ctx.citation_list())
    return 0


def _walk_documents(path: str):
    from trueno_rag_tpu import Document

    exts = (".txt", ".md")
    files: List[str] = []
    if os.path.isfile(path):
        files = [path]
    elif os.path.isdir(path):
        for root, _dirs, names in sorted(os.walk(path)):
            for name in sorted(names):
                if name.lower().endswith(exts):
                    files.append(os.path.join(root, name))
    else:
        raise SystemExit(f"error: path does not exist: {path}")
    docs = []
    for f in files:
        try:
            with open(f, "r", encoding="utf-8", errors="replace") as fh:
                content = fh.read()
        except OSError as e:
            print(f"warning: skipping {f}: {e}", file=sys.stderr)
            continue
        if content.strip():
            docs.append(Document(content, title=os.path.basename(f), source=f))
    if not docs:
        raise SystemExit(f"error: no indexable .txt/.md documents under {path}")
    return docs


def _doc_tags_for(docs, args):
    """The index command's document-tag assignment (shared by the
    hybrid and multi-vector paths)."""
    base_tags = [t for t in (args.tags or "").split(",") if t]
    if not base_tags and not args.tag_by_dir:
        return None
    doc_tags = []
    root = os.path.abspath(args.path)
    for d in docs:
        tags = list(base_tags)
        if args.tag_by_dir and d.source:
            rel = os.path.relpath(os.path.abspath(d.source), root)
            parent = os.path.dirname(rel)
            if parent and parent != ".":
                tags.append(f"dir:{parent.split(os.sep)[0]}")
        doc_tags.append(tags)
    return doc_tags


def _cmd_index_multi_vector(args, docs) -> int:
    """Multi-vector (late-interaction / MaxSim) indexing: chunks store a
    token MATRIX each; queries run certified tiered scans. The encoder
    identity is the deterministic seed-0 demo encoder — real
    deployments pass checkpoints through the library API
    (persist.load_token_index(params=...))."""
    from trueno_rag_tpu import RecursiveChunker
    from trueno_rag_tpu.index.token_store import TokenStoreConfig
    from trueno_rag_tpu.models.encoder import EncoderConfig
    from trueno_rag_tpu.models.late_interaction import LateInteractionRetriever
    from trueno_rag_tpu.persist import save_token_index

    chunker = RecursiveChunker(
        chunk_size=args.chunk_size, overlap=args.chunk_overlap
    )
    enc = EncoderConfig.tiny()
    retr = LateInteractionRetriever(
        config=enc,
        seed=0,
        max_len=32,
        store_config=TokenStoreConfig(
            hidden_dim=enc.hidden_dim, max_tokens=32, scan="tiered",
        ),
    )
    doc_tags = _doc_tags_for(docs, args)
    n_chunks = 0
    for di, d in enumerate(docs):
        chunks = chunker.chunk(d)
        retr.index_batch(chunks)
        n_chunks += len(chunks)
        if doc_tags is not None and doc_tags[di]:
            for c in chunks:
                retr.store.registry.set_tags(c.id, doc_tags[di])
    os.makedirs(args.output, exist_ok=True)
    out_path = os.path.join(args.output, "token_index.trag")
    stats = save_token_index(out_path, retr)
    print(
        f"indexed {len(docs)} documents, {n_chunks} chunks (multi-vector) "
        f"-> {out_path} ({stats['compressed_bytes']} bytes compressed)"
    )
    return 0


def _cmd_index_learned_sparse(args, docs) -> int:
    """Learned-sparse (SPLADE-class) indexing: each chunk stores a
    top-T vocabulary expansion; queries score through the weighted
    block-gather posting path. Like --multi-vector, the encoder
    identity is the deterministic seed-0 demo encoder — real
    deployments pass trained checkpoints through the library API
    (persist.load_splade_index(params=...))."""
    from trueno_rag_tpu import RecursiveChunker
    from trueno_rag_tpu.models.splade import SpladeRetriever
    from trueno_rag_tpu.persist import save_splade_index

    chunker = RecursiveChunker(
        chunk_size=args.chunk_size, overlap=args.chunk_overlap
    )
    retr = SpladeRetriever(seed=0)
    doc_tags = _doc_tags_for(docs, args)
    n_chunks = 0
    for di, d in enumerate(docs):
        chunks = chunker.chunk(d)
        retr.index_batch(chunks)
        n_chunks += len(chunks)
        if doc_tags is not None and doc_tags[di]:
            for c in chunks:
                retr.registry.set_tags(c.id, doc_tags[di])
    os.makedirs(args.output, exist_ok=True)
    out_path = os.path.join(args.output, "splade_index.trag")
    stats = save_splade_index(out_path, retr)
    print(
        f"indexed {len(docs)} documents, {n_chunks} chunks (learned-sparse, "
        f"{stats['postings']} postings) -> {out_path} "
        f"({stats['compressed_bytes']} bytes compressed)"
    )
    return 0


def cmd_index(args) -> int:
    from trueno_rag_tpu import NoOpReranker, RagPipelineBuilder, RecursiveChunker
    from trueno_rag_tpu.persist import save_index

    if args.multi_vector and args.learned_sparse:
        raise SystemExit(
            "error: --multi-vector and --learned-sparse are mutually exclusive"
        )
    if args.with_learned_sparse and (args.multi_vector or args.learned_sparse):
        raise SystemExit(
            "error: --with-learned-sparse augments the HYBRID index; it "
            "cannot combine with --multi-vector/--learned-sparse"
        )
    docs = _walk_documents(args.path)
    if args.multi_vector:
        return _cmd_index_multi_vector(args, docs)
    if args.learned_sparse:
        return _cmd_index_learned_sparse(args, docs)
    embedder = _build_embedder(args.embedder, args.dimension, args.model)
    if args.embedder == "tfidf":
        embedder.fit([d.content for d in docs])
    builder = (
        RagPipelineBuilder()
        .with_embedder(embedder)
        .with_reranker(NoOpReranker())
        .with_chunker(RecursiveChunker(chunk_size=args.chunk_size, overlap=args.chunk_overlap))
    )
    if args.with_learned_sparse:
        # seed-0 encoder identity, like the other CLI model builds; the
        # loader reconstructs the same encoder from the artifact's
        # expansion config
        from trueno_rag_tpu.models.splade import SpladeEncoder

        builder = builder.with_learned_sparse(SpladeEncoder(seed=0))
    pipeline = builder.build()
    doc_tags = _doc_tags_for(docs, args)
    n_chunks = pipeline.index_documents(docs, tags=doc_tags)
    os.makedirs(args.output, exist_ok=True)
    out_path = os.path.join(args.output, "index.trag")
    info = {"type": args.embedder, "dimension": embedder.dimension, "model": args.model}
    if args.embedder == "tfidf":
        info["state"] = embedder.state_dict()
    else:
        info["seed"] = 0
    if n_chunks > 50_000:  # stream large artifacts (constant memory)
        from trueno_rag_tpu.persist import save_index_streaming

        stats = save_index_streaming(out_path, pipeline.retriever, embedder_info=info)
    else:
        stats = save_index(out_path, pipeline.retriever, embedder_info=info)
    print(
        f"indexed {len(docs)} documents, {n_chunks} chunks "
        f"-> {out_path} ({stats['compressed_bytes']} bytes compressed)"
    )
    return 0


def _load(index_dir: str, scan_tier=None):
    from trueno_rag_tpu.embed import TfIdfEmbedder
    from trueno_rag_tpu.persist import read_index_info

    path = os.path.join(index_dir, "index.trag")
    tok_path = os.path.join(index_dir, "token_index.trag")
    splade_path = os.path.join(index_dir, "splade_index.trag")
    if not os.path.exists(path):
        if os.path.exists(tok_path):
            # multi-vector artifact (index --multi-vector): rebuild the
            # late-interaction retriever with the CLI's deterministic
            # seed-0 encoder identity; its scan tier persisted with the
            # store config
            from trueno_rag_tpu.persist import load_token_index

            return load_token_index(tok_path, seed=0)
        if os.path.exists(splade_path):
            # learned-sparse artifact (index --learned-sparse): same
            # seed-0 encoder identity contract as the other CLI builds
            from trueno_rag_tpu.persist import load_splade_index

            return load_splade_index(splade_path, seed=0)
        raise SystemExit(f"error: no index found at {path}")
    # header-only peek: handles BOTH artifact formats (the v2 streaming
    # container is what `index` itself writes past 50k chunks — reading
    # it as a v1 blob failed with 'bad magic' before)
    payload = read_index_info(path)
    info = payload.get("embedder", {})
    kind = info.get("type", "tfidf")
    if kind == "tfidf":
        if "state" in info:
            embedder = TfIdfEmbedder.from_state_dict(info["state"])
        else:
            # Legacy artifact without persisted vocabulary: re-fitting on
            # chunk texts gives a DIFFERENT df/idf space than the one the
            # stored matrix was embedded in (the reference CLI has the
            # same quirk, main.rs:468-477) — dense scores will be
            # inconsistent. Our `index` command always persists state.
            print(
                "warning: index lacks persisted TF-IDF state; re-fitting on "
                "chunks — dense scores may be inconsistent",
                file=sys.stderr,
            )
            embedder = TfIdfEmbedder(info.get("dimension", 128))
            embedder.fit([c["content"] for c in payload["chunks"]])
    else:
        embedder = _build_embedder("semantic", info.get("dimension", 384), info.get("model"), info.get("seed", 0))
    from trueno_rag_tpu.persist import load_index

    learned_encoder = None
    learned_meta = payload.get("learned")
    if learned_meta:
        # tri-hybrid artifact: rebuild the encoder from the SAVED
        # identity (seed + expansion config; load_index verifies the
        # weights fingerprint) and re-attach the learned source
        from trueno_rag_tpu.models.splade import SpladeEncoder

        learned_encoder = SpladeEncoder(
            seed=int(learned_meta.get("seed") or 0),
            max_len=int(learned_meta["max_len"]),
            doc_top=int(learned_meta["doc_top"]),
            query_top=int(learned_meta["query_top"]),
        )
    retr, _ = load_index(path, embedder, scan_tier=scan_tier,
                         learned_encoder=learned_encoder)
    return retr


def cmd_query(args) -> int:
    retr = _load(args.index, scan_tier=args.scan_tier)
    tag_filter = None
    if args.filter_all or args.filter_any or args.filter_none:
        from trueno_rag_tpu.retrieve import TagFilter

        split = lambda v: tuple(t for t in (v or "").split(",") if t)  # noqa: E731
        tag_filter = TagFilter(all=split(args.filter_all),
                               any=split(args.filter_any),
                               none=split(args.filter_none))
    results = retr.retrieve(args.query_text, args.top_k, tag_filter=tag_filter)
    if args.format == "json":
        out = [
            {
                "rank": i + 1,
                "score": r.best_score(),
                "dense_score": r.dense_score,
                "sparse_score": r.sparse_score,
                "fused_score": r.fused_score,
                "learned_score": r.learned_score,
                "title": r.chunk.metadata.title,
                "source": r.chunk.metadata.custom.get("source"),
                "content": r.chunk.content,
            }
            for i, r in enumerate(results)
        ]
        print(json.dumps(out, indent=2))
    else:
        if not results:
            print("no results")
        for i, r in enumerate(results, 1):
            title = r.chunk.metadata.title or "untitled"
            print(f"{i}. [{r.best_score():.4f}] {title}")
            print(f"   {r.chunk.content[:160]}")
    return 0


def cmd_serve(args) -> int:
    from trueno_rag_tpu.serve import run_server

    retr = _load(args.index, scan_tier=args.scan_tier)
    max_batch = "auto" if args.autotune else args.max_batch
    run_server(retr, host=args.host, port=args.port,
               max_batch=max_batch, max_wait_ms=args.max_wait_ms,
               latency_budget_ms=args.latency_budget_ms,
               workers=args.workers,
               # POST /reload re-reads with the same tier
               index_loader=lambda: _load(args.index, scan_tier=args.scan_tier))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="trueno-rag-tpu", description="TPU-native RAG pipeline CLI")
    sub = p.add_subparsers(dest="command", required=True)

    sub.add_parser("info", help="show version and components").set_defaults(fn=cmd_info)

    d = sub.add_parser("demo", help="run the built-in demo pipeline")
    d.add_argument("--query", default="How does hybrid search combine retrieval methods?")
    d.add_argument("--top-k", type=int, default=3)
    d.set_defaults(fn=cmd_demo)

    i = sub.add_parser("index", help="index .txt/.md documents")
    i.add_argument("--path", required=True, help="file or directory to index")
    i.add_argument("--output", required=True, help="output directory for the index artifact")
    i.add_argument("--chunk-size", type=int, default=512)
    i.add_argument("--chunk-overlap", type=int, default=64)
    i.add_argument("--dimension", type=int, default=256)
    i.add_argument("--embedder", choices=["tfidf", "semantic"], default="tfidf")
    i.add_argument("--model", default=None, help="semantic model: mini-lm|mini-lm-l12|bge-small|bge-base")
    i.add_argument("--tags", default=None,
                   help="comma-separated tags applied to every document")
    i.add_argument("--tag-by-dir", action="store_true",
                   help="tag each document dir:<top-level subdirectory>")
    i.add_argument("--multi-vector", action="store_true",
                   help="build a late-interaction (MaxSim) token index "
                        "instead of the hybrid dense+BM25 index: every "
                        "chunk stores a token matrix, queries run the "
                        "certified fused-kernel scan tier; query/serve "
                        "auto-detect the artifact (token_index.trag)")
    i.add_argument("--learned-sparse", action="store_true",
                   help="build a learned-sparse (SPLADE-class) posting "
                        "index instead of the hybrid dense+BM25 index: "
                        "every chunk stores a top-T vocabulary expansion, "
                        "queries score through the weighted block-gather "
                        "posting path; query/serve auto-detect the "
                        "artifact (splade_index.trag)")
    i.add_argument("--with-learned-sparse", action="store_true",
                   help="ALSO attach a learned-sparse (SPLADE-class) "
                        "third source to the hybrid index: queries fuse "
                        "dense + BM25 + learned expansions N-way; the "
                        "expansions persist inside index.trag and "
                        "query/serve re-attach them automatically")
    i.set_defaults(fn=cmd_index)

    q = sub.add_parser("query", help="query a persisted index")
    q.add_argument("query_text")
    q.add_argument("--index", required=True, help="directory containing index.trag")
    q.add_argument("--top-k", type=int, default=5)
    q.add_argument("--format", choices=["text", "json"], default="text")
    q.add_argument("--filter-all", default=None, help="comma-separated tags results must ALL carry")
    q.add_argument("--filter-any", default=None, help="comma-separated tags; results need at least one")
    q.add_argument("--filter-none", default=None, help="comma-separated tags results must NOT carry")
    q.add_argument("--scan-tier", choices=["none", "auto", "bf16", "int8", "compact", "clustered"],
                   default=None,
                   help="dense scan tier for the loaded store (default fp32; "
                        "'auto' engages the certified bf16 tier past ~400k rows, "
                        "'compact' serves multi-million-chunk indexes without a "
                        "fp32 matrix in HBM)")
    q.set_defaults(fn=cmd_query)

    s = sub.add_parser("serve", help="serve a persisted index over HTTP (micro-batched)")
    s.add_argument("--index", required=True, help="directory containing index.trag")
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8080)
    s.add_argument("--max-batch", type=int, default=32)
    s.add_argument("--max-wait-ms", type=float, default=5.0)
    s.add_argument("--autotune", action="store_true",
                   help="calibrate max-batch/max-wait by measurement at startup")
    s.add_argument("--latency-budget-ms", type=float, default=None,
                   help="with --autotune: exclude batch sizes whose p50 exceeds this")
    s.add_argument("--scan-tier", choices=["none", "auto", "bf16", "int8", "compact", "clustered"],
                   default="auto",
                   help="dense scan tier for serving (default 'auto': fp32 below "
                        "~400k rows, certified bf16 tier past it; 'compact' for "
                        "indexes whose fp32 matrix exceeds HBM)")
    s.add_argument("--workers", type=int, default=0,
                   help="HTTP front-end worker processes (SO_REUSEPORT); "
                        "0 = serve HTTP from this process")
    s.set_defaults(fn=cmd_serve)
    return p


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    try:
        return args.fn(args)
    except BrokenPipeError:  # downstream pipe (e.g. `| head`) closed early
        try:
            sys.stdout.close()
        except OSError:
            pass
        return 0


if __name__ == "__main__":
    sys.exit(main())
