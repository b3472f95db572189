"""Native C++ runtime tests: tokenizer parity with the Python tokenizer,
postings parity with the dict builder, BM25Index integration (native
bulk build vs pure-Python search results), mutation fallback."""

import numpy as np
import pytest

from trueno_rag_tpu.chunking import Chunk, ChunkMetadata, chunk_id_from_int
from trueno_rag_tpu.index import BM25Index
from trueno_rag_tpu.native import NativeBM25Builder, native_available
from trueno_rag_tpu.text import tokenize

pytestmark = pytest.mark.skipif(not native_available(), reason="native lib unavailable")

TEXTS = [
    "The quick brown fox jumps over the lazy dog",
    "Machine learning models process large data sets quickly",
    "Ünïcödé should split on multibyte bytes — naturally!",
    "a ab abc the of and x1 X1 MIXED case TOKENS",
    "",
    "   \t\n  ",
    "repeated repeated repeated words words",
]


def mk_chunk(i, content):
    return Chunk(
        document_id="d",
        content=content,
        start_offset=0,
        end_offset=len(content),
        metadata=ChunkMetadata(),
        id=chunk_id_from_int(i),
    )


def test_tokenizer_count_parity():
    b = NativeBM25Builder()
    for t in TEXTS:
        assert b.tokenize_count(t) == len(tokenize(t)), repr(t)


def test_postings_parity_with_python_dicts():
    from collections import Counter

    b = NativeBM25Builder()
    usable = [t for t in TEXTS if tokenize(t)]
    b.add_batch(range(len(usable)), usable)
    exp = b.export()

    postings = {}
    for i, t in enumerate(usable):
        for term, c in Counter(tokenize(t)).items():
            postings.setdefault(term, {})[i] = c
    assert exp["terms"] == sorted(postings)
    indptr = exp["indptr"]
    for ti, term in enumerate(exp["terms"]):
        lo, hi = int(indptr[ti]), int(indptr[ti + 1])
        got = {int(exp["rows"][j]): int(exp["tfs"][j]) for j in range(lo, hi)}
        assert got == postings[term], term
    # rows ascending within each term
    for ti in range(len(exp["terms"])):
        lo, hi = int(indptr[ti]), int(indptr[ti + 1])
        seg = exp["rows"][lo:hi]
        assert (np.diff(seg) > 0).all() if len(seg) > 1 else True


def test_doc_lengths_and_totals():
    b = NativeBM25Builder()
    counts = b.add_batch([5, 9], ["alpha beta gamma", "delta epsilon"])
    assert list(counts) == [3, 2]
    exp = b.export()
    assert dict(zip(exp["doc_len_rows"].tolist(), exp["doc_len_vals"].tolist())) == {5: 3, 9: 2}
    assert exp["total_len"] == 5


def test_bm25_index_native_matches_python():
    corpus = [t for t in TEXTS if tokenize(t)] * 3
    nat = BM25Index(use_native=True)
    py = BM25Index(use_native=False)
    chunks_nat = [mk_chunk(i, t) for i, t in enumerate(corpus)]
    chunks_py = [mk_chunk(i, t) for i, t in enumerate(corpus)]
    nat.add_batch(chunks_nat)
    py.add_batch(chunks_py)
    assert nat.native_active and not py.native_active
    assert nat.avg_doc_length == pytest.approx(py.avg_doc_length)
    for q in ["quick fox", "data models", "tokens case", "nothing matches here zzz"]:
        rn = nat.search(q, 10)
        rp = py.search(q, 10)
        assert [c for c, _ in rn] == [c for c, _ in rp], q
        for (c1, s1), (c2, s2) in zip(rn, rp):
            assert s1 == pytest.approx(s2, rel=1e-5)


def test_native_mutation_falls_back():
    corpus = ["alpha beta gamma", "beta gamma delta", "gamma delta epsilon"]
    idx = BM25Index(use_native=True)
    chunks = [mk_chunk(i, t) for i, t in enumerate(corpus)]
    idx.add_batch(chunks)
    assert idx.native_active
    assert idx.remove(chunks[0].id)
    assert not idx.native_active  # materialized
    res = idx.search("alpha", 5)
    assert res == []
    res = idx.search("delta", 5)
    assert len(res) == 2
    # re-add works on the python path
    idx.add(mk_chunk(7, "alpha returns"))
    assert idx.search("alpha", 5)


def test_native_replacement_via_add():
    idx = BM25Index(use_native=True)
    c = mk_chunk(1, "original words here")
    idx.add(c)
    c2 = mk_chunk(1, "replacement text instead")  # same id -> same row
    idx.add(c2)
    assert idx.search("original", 5) == []
    assert idx.search("replacement", 5)
