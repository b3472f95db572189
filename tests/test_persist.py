"""Persistence tests (reference: compressed.rs:186-270 — codec
round-trips, empty-input contract, BM25 score preservation to 1e-5
through a save/load cycle; extended to the full hybrid artifact)."""

import pytest

from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
from trueno_rag_tpu.embed import TfIdfEmbedder
from trueno_rag_tpu.errors import IndexNotFoundError, SerializationError
from trueno_rag_tpu.persist import (
    Compression,
    default_compression,
    deserialize_compressed,
    load_index,
    save_index,
    serialize_compressed,
)
from trueno_rag_tpu.retrieve import HybridRetriever

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "machine learning models process large data sets",
    "foxes are clever wild animals living in forests",
    "deep neural networks learn hierarchical features",
]


def mk_chunk(i, content, dim, emb):
    c = Chunk(
        document_id="doc",
        content=content,
        start_offset=0,
        end_offset=len(content),
        metadata=ChunkMetadata(title=f"t{i}"),
        id=chunk_id_from_int(i),
    )
    c.set_embedding(emb.embed_document(content))
    return c


@pytest.mark.parametrize("codec", [Compression.ZLIB, Compression.ZSTD, Compression.NONE])
def test_codec_roundtrip(codec):
    data = b"hello " * 1000
    comp = codec.compress(data)
    if codec is not Compression.NONE:
        assert len(comp) < len(data)
    assert codec.decompress(comp) == data


def test_codec_empty_contract():
    for codec in (Compression.ZLIB, Compression.ZSTD):
        assert codec.compress(b"") == b""
        assert codec.decompress(b"") == b""


def test_serialize_roundtrip():
    obj = {"a": [1, 2, 3], "b": "text", "c": {"nested": True}, "bin": b"\x00\x01"}
    blob = serialize_compressed(obj)
    assert deserialize_compressed(blob) == obj


def test_bad_magic_rejected():
    with pytest.raises(SerializationError):
        deserialize_compressed(b"not an artifact at all")


def test_default_compression_is_zstd():
    assert default_compression() == Compression.ZSTD


def test_index_roundtrip_preserves_scores(tmp_path):
    emb = TfIdfEmbedder(32).fit(CORPUS)
    retr = HybridRetriever(emb)
    chunks = [mk_chunk(i, t, 32, emb) for i, t in enumerate(CORPUS)]
    retr.index_batch(chunks)

    path = str(tmp_path / "index.trag")
    stats = save_index(path, retr, embedder_info={"type": "tfidf", "dimension": 32})
    assert stats["chunks"] == 4
    assert stats["compressed_bytes"] > 0

    retr2, emb_info = load_index(path, emb)
    assert emb_info["type"] == "tfidf"
    assert len(retr2) == 4

    for q in ["fox", "learning data", "quick brown fox"]:
        before = retr.retrieve(q, 4)
        after = retr2.retrieve(q, 4)
        assert [r.chunk.content for r in before] == [r.chunk.content for r in after], q
        for b, a in zip(before, after):
            assert a.best_score() == pytest.approx(b.best_score(), abs=1e-5)
            if b.sparse_score is not None:
                assert a.sparse_score == pytest.approx(b.sparse_score, abs=1e-5)


def test_index_roundtrip_chunk_fidelity(tmp_path):
    emb = TfIdfEmbedder(16).fit(CORPUS)
    retr = HybridRetriever(emb)
    c = mk_chunk(7, CORPUS[0], 16, emb)
    c.metadata.headers = ["H1", "H2"]
    c.metadata.page = 3
    retr.index(c)
    path = str(tmp_path / "idx.trag")
    save_index(path, retr)
    retr2, _ = load_index(path, emb)
    got = retr2.registry.get_chunk(c.id)
    assert got.content == c.content
    assert got.metadata.headers == ["H1", "H2"]
    assert got.metadata.page == 3
    assert got.document_id == c.document_id


def test_load_missing_raises(tmp_path):
    emb = TfIdfEmbedder(8).fit(CORPUS)
    with pytest.raises(IndexNotFoundError):
        load_index(str(tmp_path / "nope.trag"), emb)


def test_compression_ratio_on_index(tmp_path):
    """Docs claim 3-6x on index data (compression.md:47-59); verify we
    land in a sane band on text-heavy payloads."""
    emb = TfIdfEmbedder(32).fit(CORPUS)
    retr = HybridRetriever(emb)
    chunks = [mk_chunk(i, CORPUS[i % 4] * 5, 32, emb) for i in range(40)]
    retr.index_batch(chunks)
    path = str(tmp_path / "c.trag")
    stats = save_index(path, retr)
    # embeddings are random-ish floats (incompressible); text compresses
    assert stats["compressed_bytes"] < stats["raw_bytes_estimate"] * 1.2


def test_bm25_compressed_bytes_roundtrip():
    """BM25Index::to/from_compressed_bytes parity (compressed.rs:92-108):
    search scores preserved through the byte round-trip."""
    from trueno_rag_tpu.index import BM25Index

    emb = TfIdfEmbedder(16).fit(CORPUS)
    idx = BM25Index()
    chunks = [mk_chunk(i, t, 16, emb) for i, t in enumerate(CORPUS)]
    idx.add_batch(chunks)
    blob = idx.to_compressed_bytes()
    assert isinstance(blob, bytes) and len(blob) > 0

    idx2 = BM25Index.from_compressed_bytes(blob, registry=idx.registry)
    for q in ["fox", "learning data"]:
        a = idx.search(q, 5)
        b = idx2.search(q, 5)
        assert [c for c, _ in a] == [c for c, _ in b]
        for (_, s1), (_, s2) in zip(a, b):
            assert s1 == pytest.approx(s2, abs=1e-5)


@pytest.mark.parametrize("frame_rows", [2, 3, 100])
def test_streaming_index_roundtrip(tmp_path, frame_rows):
    """v2 streaming artifacts must load through the same load_index and
    reproduce identical search results, for frame sizes that split the
    matrix mid-corpus and ones that don't."""
    from trueno_rag_tpu.persist import save_index_streaming

    emb = TfIdfEmbedder(32).fit(CORPUS)
    retr = HybridRetriever(emb)
    retr.index_batch([mk_chunk(i, t, 32, emb) for i, t in enumerate(CORPUS)])
    path = str(tmp_path / "idx.trag2")
    stats = save_index_streaming(path, retr, embedder_info={"type": "tfidf"}, frame_rows=frame_rows)
    assert stats["chunks"] == len(CORPUS)
    assert stats["matrix_frames"] == -(-len(CORPUS) // frame_rows)
    retr2, info = load_index(path, emb)
    assert info == {"type": "tfidf"}
    for q in ["fox forest animals", "neural network data"]:
        a = [(r.chunk.id, round(r.best_score(), 6)) for r in retr.retrieve(q, 3)]
        b = [(r.chunk.id, round(r.best_score(), 6)) for r in retr2.retrieve(q, 3)]
        assert a == b, q


def test_streaming_matches_v1_results(tmp_path):
    from trueno_rag_tpu.persist import save_index, save_index_streaming

    emb = TfIdfEmbedder(32).fit(CORPUS)
    retr = HybridRetriever(emb)
    retr.index_batch([mk_chunk(i, t, 32, emb) for i, t in enumerate(CORPUS)])
    p1 = str(tmp_path / "v1.trag")
    p2 = str(tmp_path / "v2.trag")
    save_index(p1, retr)
    save_index_streaming(p2, retr)
    r1, _ = load_index(p1, emb)
    r2, _ = load_index(p2, emb)
    q = "clever fox learning"
    assert [r.chunk.id for r in r1.retrieve(q, 4)] == [r.chunk.id for r in r2.retrieve(q, 4)]


def test_streaming_truncated_artifact_rejected(tmp_path):
    from trueno_rag_tpu.errors import SerializationError
    from trueno_rag_tpu.persist import save_index_streaming

    emb = TfIdfEmbedder(32).fit(CORPUS)
    retr = HybridRetriever(emb)
    retr.index_batch([mk_chunk(i, t, 32, emb) for i, t in enumerate(CORPUS)])
    path = str(tmp_path / "trunc.trag2")
    save_index_streaming(path, retr)
    blob = open(path, "rb").read()
    open(path, "wb").write(blob[: len(blob) - 40])  # chop into the last frame
    with pytest.raises((SerializationError, Exception)):
        load_index(path, emb)


# ---------------------------------------------------------------------------
# LZ4 codec (reference: compressed.rs:13-65 via lz4_flex; bound to the
# system liblz4 through ctypes, same prepend-size wire format)
# ---------------------------------------------------------------------------


def _lz4_live():
    from trueno_rag_tpu import _lz4

    return _lz4.available()


@pytest.mark.skipif(not _lz4_live(), reason="liblz4 not present in image")
def test_lz4_roundtrip_and_framing():
    data = b"the quick brown fox " * 500
    comp = Compression.LZ4.compress(data)
    assert len(comp) < len(data)  # ~3-4x on text per the reference's book
    # lz4_flex compress_prepend_size framing: u32-LE raw length first
    assert int.from_bytes(comp[:4], "little") == len(data)
    assert Compression.LZ4.decompress(comp) == data
    # empty contract matches the reference (compressed.rs empty-input test)
    assert Compression.LZ4.compress(b"") == b""
    assert Compression.LZ4.decompress(b"") == b""


@pytest.mark.skipif(not _lz4_live(), reason="liblz4 not present in image")
def test_lz4_error_taxonomy():
    with pytest.raises(SerializationError):
        Compression.LZ4.decompress(b"\x01")  # truncated size prefix
    with pytest.raises(SerializationError):
        # declared size 64 but the block stream is garbage
        Compression.LZ4.decompress((64).to_bytes(4, "little") + b"\xff\xff\xff\xff")
    good = Compression.LZ4.compress(b"x" * 100)
    bad = (200).to_bytes(4, "little") + good[4:]  # size-prefix lie
    with pytest.raises(SerializationError):
        Compression.LZ4.decompress(bad)


@pytest.mark.skipif(not _lz4_live(), reason="liblz4 not present in image")
def test_lz4_incompressible_roundtrip():
    import os as _os

    data = _os.urandom(4096)  # random bytes: LZ4 must still round-trip
    assert Compression.LZ4.decompress(Compression.LZ4.compress(data)) == data


@pytest.mark.skipif(not _lz4_live(), reason="liblz4 not present in image")
def test_index_roundtrip_lz4(tmp_path):
    emb = TfIdfEmbedder(32).fit(CORPUS)
    retr = HybridRetriever(emb)
    for i, t in enumerate(CORPUS):
        retr.index(mk_chunk(i, t, 32, emb))
    path = str(tmp_path / "idx.lz4.trag")
    save_index(path, retr, codec=Compression.LZ4)
    retr2, _ = load_index(path, emb)
    q = CORPUS[0][:30]
    r1 = [(r.chunk.id, round(r.best_score(), 5)) for r in retr.retrieve(q, 3)]
    r2 = [(r.chunk.id, round(r.best_score(), 5)) for r in retr2.retrieve(q, 3)]
    assert r1 == r2


def test_lz4_availability_probe_is_graceful():
    # is_available never raises, whatever the image ships
    assert Compression.LZ4.is_available in (True, False)
    assert Compression.ZLIB.is_available is True


def test_clustered_index_roundtrip_skips_reclustering(tmp_path):
    """A clustered store's k-means layout persists with the artifact:
    loading with scan_tier='clustered' consumes it (no re-clustering)
    and serves identical results; any post-load mutation discards the
    preset (stale radii would be unsound bounds)."""
    import numpy as np

    from trueno_rag_tpu.embed import MockEmbedder
    from trueno_rag_tpu.index.vector_store import VectorStoreConfig
    from trueno_rag_tpu.ops import clustered as cl
    from trueno_rag_tpu.persist import load_index, save_index
    from trueno_rag_tpu.retrieve import HybridRetriever

    rng = np.random.default_rng(31)
    dim, n, blobs = 32, 4096, 4
    centers = rng.standard_normal((blobs, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    which = np.repeat(np.arange(blobs), n // blobs)
    m = centers[which] + 0.05 * rng.standard_normal((n, dim)).astype(np.float32)

    emb = MockEmbedder(dimension=dim)
    retr = HybridRetriever(
        emb,
        vector_config=VectorStoreConfig(
            dimension=dim, scan_tier="clustered", scan_tile_n=1024,
            cluster_probe_tiles=2,
        ),
    )
    chunks = []
    for i in range(n):
        c = Chunk(document_id="d", content=f"doc {i} words here",
                  start_offset=0, end_offset=5, metadata=ChunkMetadata(),
                  id=chunk_id_from_int(i))
        c.set_embedding(m[i])
        chunks.append(c)
    retr.index_batch(chunks)
    q = centers[1].astype(np.float32)
    want = retr.vector_store.search(q, 5)  # triggers the clustered build
    assert retr.vector_store._cluster is not None

    path = str(tmp_path / "clustered.trag")
    save_index(path, retr)

    # loading must CONSUME the persisted layout, never re-cluster
    def boom(*a, **k):
        raise AssertionError("re-clustered despite persisted layout")

    orig = cl.prepare_clustered
    cl.prepare_clustered = boom
    try:
        loaded, _ = load_index(path, emb, scan_tier="clustered")
        got = loaded.vector_store.search(q, 5)
    finally:
        cl.prepare_clustered = orig
    assert [g[0] for g in got] == [w[0] for w in want]
    np.testing.assert_allclose(
        [g[1] for g in got], [w[1] for w in want], rtol=2e-6, atol=2e-6
    )

    # a mutation after load discards the preset -> normal re-cluster
    loaded2, _ = load_index(path, emb, scan_tier="clustered")
    assert loaded2.vector_store._cluster_preset is not None
    extra = Chunk(document_id="d", content="new", start_offset=0,
                  end_offset=3, metadata=ChunkMetadata(),
                  id=chunk_id_from_int(99_999))
    extra.set_embedding(q)  # make it the clear top-1
    loaded2.vector_store.insert(extra)
    assert loaded2.vector_store._cluster_preset is None
    got2 = loaded2.vector_store.search(q, 5)
    assert got2[0][0] == chunk_id_from_int(99_999)

    # ... and so does a BULK insert (insert_many used to leave the
    # preset alive: the first clustered build then consumed a layout in
    # which the new rows sat in no tile — invisible to every query,
    # yet still certified)
    loaded3, _ = load_index(path, emb, scan_tier="clustered")
    assert loaded3.vector_store._cluster_preset is not None
    extra2 = Chunk(document_id="d", content="new bulk", start_offset=0,
                   end_offset=3, metadata=ChunkMetadata(),
                   id=chunk_id_from_int(99_998))
    extra2.set_embedding(q)  # the clear top-1 for q
    loaded3.vector_store.insert_many([extra2])
    assert loaded3.vector_store._cluster_preset is None
    got3 = loaded3.vector_store.search(q, 5)
    assert got3[0][0] == chunk_id_from_int(99_998)


def _tiny_retriever(metric="cosine", prefixes=False):
    import numpy as np

    from trueno_rag_tpu.embed import EmbeddingConfig, TfIdfEmbedder
    from trueno_rag_tpu.index.vector_store import VectorStoreConfig
    from trueno_rag_tpu.retrieve import HybridRetriever

    texts = [f"doc number {i} about topic{i % 3}" for i in range(12)]
    cfg = EmbeddingConfig(query_prefix="q: ", document_prefix="d: ") if prefixes else None
    emb = TfIdfEmbedder(16, config=cfg).fit(texts)
    retr = HybridRetriever(
        emb, vector_config=VectorStoreConfig(dimension=16, metric=metric)
    )
    for i, t in enumerate(texts):
        c = Chunk(document_id="d", content=t, start_offset=0, end_offset=len(t),
                  metadata=ChunkMetadata(), id=chunk_id_from_int(i))
        c.set_embedding(np.asarray(emb.embed_document(t)) * (2.0 if metric == "dot" else 1.0))
        retr.index(c)
    return retr, emb


def test_read_index_info_both_formats(tmp_path):
    """Regression (review r3): the CLI peeks embedder identity before
    constructing the embedder; that peek must read BOTH artifact
    formats (the v2 streaming container is what `index` itself writes
    past 50k chunks — it failed with 'bad magic' before)."""
    from trueno_rag_tpu.persist import (read_index_info, save_index,
                                        save_index_streaming)

    retr, emb = _tiny_retriever()
    info = {"type": "tfidf", "dimension": 16, "state": emb.state_dict()}
    p1, p2 = str(tmp_path / "v1.trag"), str(tmp_path / "v2.trag")
    save_index(p1, retr, embedder_info=info)
    save_index_streaming(p2, retr, embedder_info=info, frame_rows=5)
    for p, version in ((p1, 1), (p2, 2)):
        meta = read_index_info(p)
        assert meta["embedder"]["type"] == "tfidf"
        assert meta["dimension"] == 16 and meta["version"] == version
        assert len(meta["chunks"]) == 12


def test_streaming_boundary_truncation_raises(tmp_path):
    """Regression (review r3): truncating a v2 artifact exactly at a
    frame boundary previously looped forever (EOF read -> empty frame
    that never advances); it must raise SerializationError."""
    from trueno_rag_tpu.persist import load_index, save_index_streaming

    retr, emb = _tiny_retriever()
    p = str(tmp_path / "s.trag")
    save_index_streaming(p, retr, frame_rows=5)  # 3 frames
    data = open(p, "rb").read()
    # find the start of the LAST frame by walking the container
    from trueno_rag_tpu.persist import MAGIC2

    off = len(MAGIC2)
    while data[off] != 0:
        off += 1
    off += 1
    hdr_len = int.from_bytes(data[off:off + 8], "little")
    off += 8 + hdr_len
    for _ in range(2):  # skip two complete frames
        comp_len = int.from_bytes(data[off:off + 8], "little")
        off += 16 + comp_len
    open(p, "wb").write(data[:off])  # drop the final frame entirely
    with pytest.raises(SerializationError):
        load_index(p, emb)


def test_metric_roundtrips_through_persistence(tmp_path):
    """Regression (review r3): a dot-metric index reloaded as the
    default cosine would silently re-normalize every row."""
    import numpy as np

    from trueno_rag_tpu.persist import load_index, save_index

    retr, emb = _tiny_retriever(metric="dot")
    p = str(tmp_path / "dot.trag")
    save_index(p, retr)
    loaded, _ = load_index(p, emb)
    assert loaded.vector_store.config.metric == "dot"
    # rows preserved verbatim (cosine would have unit-normalized them)
    row = loaded.registry.row_of(chunk_id_from_int(0))
    orig_row = retr.registry.row_of(chunk_id_from_int(0))
    np.testing.assert_array_equal(
        loaded.vector_store._host[row], retr.vector_store._host[orig_row]
    )
    assert np.linalg.norm(loaded.vector_store._host[row]) > 1.5  # not unit


def test_tfidf_embedding_config_roundtrips():
    """Regression (review r3): query/document prefixes fold into the
    fitted token space; dropping them on reload silently degrades
    retrieval."""
    from trueno_rag_tpu.embed import TfIdfEmbedder

    _, emb = _tiny_retriever(prefixes=True)
    emb2 = TfIdfEmbedder.from_state_dict(emb.state_dict())
    assert emb2.config.query_prefix == "q: "
    assert emb2.config.document_prefix == "d: "
    import numpy as np

    np.testing.assert_array_equal(emb2.embed_query("topic1"), emb.embed_query("topic1"))


def test_compact_scan_layout_survives_roundtrip(tmp_path):
    """A bf16rr-configured store must reload as bf16rr (r5): silently
    downgrading to bf16r would serve with the ~2e-5 certificate interval
    the owner explicitly paid 4 B/elem to escape. Pre-r5 artifacts lack
    the header key and keep the config default."""
    from trueno_rag_tpu.index.vector_store import VectorStoreConfig
    from trueno_rag_tpu.persist import save_index_streaming

    emb = TfIdfEmbedder(32).fit(CORPUS)
    retr = HybridRetriever(
        emb, vector_config=VectorStoreConfig(dimension=32,
                                             compact_scan="bf16rr"))
    retr.index_batch([mk_chunk(i, t, 32, emb) for i, t in enumerate(CORPUS)])
    for path, saver in [(str(tmp_path / "a.trag"), save_index),
                        (str(tmp_path / "b.trag"), save_index_streaming)]:
        saver(path, retr)
        retr2, _ = load_index(path, emb)
        assert retr2.vector_store.config.compact_scan == "bf16rr", path
        # engaging the compact tier on the reloaded store builds the
        # 9-array two-level layout, not the 6-array bf16r one
        retr3, _ = load_index(path, emb, scan_tier="compact")
        got = [r.chunk.content for r in retr3.retrieve("fox", 3)]
        want = [r.chunk.content for r in retr.retrieve("fox", 3)]
        assert got == want
        assert len(retr3.vector_store._tier) == 9, path
