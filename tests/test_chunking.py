"""Chunker tests — mirrors the reference's inline unit tests and proptest
invariants (chunk.rs #[cfg(test)] + chunk.rs:1526-1591): no empty chunks,
unique ids, size caps, document-id propagation, empty-document errors.
Our chunkers guarantee a stronger invariant too: content is an exact
document substring at [start_offset, end_offset)."""

import pytest
from hypothesis import example, given, settings, strategies as st

from trueno_rag_tpu import (
    Document,
    EmptyDocumentError,
    FixedSizeChunker,
    ParagraphChunker,
    RecursiveChunker,
    SemanticChunker,
    SentenceChunker,
    StructuralChunker,
    ChunkingStrategy,
)
from trueno_rag_tpu.embed import MockEmbedder

DOC_TEXT = (
    "The quick brown fox jumps over the lazy dog. "
    "Machine learning systems retrieve documents. "
    "TPUs multiply matrices very quickly.\n\n"
    "A second paragraph talks about something else entirely. "
    "It has several sentences. Some are short. Others are a little bit longer than that.\n\n"
    "A third paragraph closes the document."
)


def _doc(text=DOC_TEXT):
    return Document(text, title="T")


ALL_CHUNKERS = [
    RecursiveChunker(chunk_size=64, overlap=10),
    FixedSizeChunker(chunk_size=64, overlap=10),
    SentenceChunker(max_sentences=2, overlap=1),
    ParagraphChunker(max_paragraphs=1),
    StructuralChunker(max_section_size=128),
    SemanticChunker(MockEmbedder(32), similarity_threshold=0.9, max_chunk_size=128),
]


@pytest.mark.parametrize("chunker", ALL_CHUNKERS, ids=lambda c: type(c).__name__)
def test_common_invariants(chunker):
    doc = _doc()
    chunks = chunker.chunk(doc)
    assert chunks
    ids = [c.id for c in chunks]
    assert len(set(ids)) == len(ids), "chunk ids must be unique"
    for c in chunks:
        assert c.content.strip(), "no empty chunks"
        assert c.document_id == doc.id
        assert c.metadata.title == "T"
        assert 0 <= c.start_offset < c.end_offset <= len(doc.content)
        assert c.content == doc.content[c.start_offset : c.end_offset]


@pytest.mark.parametrize("chunker", ALL_CHUNKERS, ids=lambda c: type(c).__name__)
def test_empty_document_raises(chunker):
    for content in ("", "   \n\t  "):
        with pytest.raises(EmptyDocumentError):
            chunker.chunk(Document(content))


def test_recursive_respects_chunk_size():
    ch = RecursiveChunker(chunk_size=64, overlap=10)
    chunks = ch.chunk(_doc())
    for c in chunks:
        # overlap may extend a chunk by up to `overlap` chars
        assert len(c.content) <= 64 + 10


def test_recursive_overlap_extends_backwards():
    ch = RecursiveChunker(chunk_size=64, overlap=10)
    chunks = ch.chunk(_doc())
    assert len(chunks) >= 2
    for prev, cur in zip(chunks, chunks[1:]):
        # consecutive chunks overlap or at least touch
        assert cur.start_offset <= prev.end_offset


def test_recursive_char_fallback_on_unbroken_text():
    text = "x" * 500
    ch = RecursiveChunker(chunk_size=100, overlap=0)
    chunks = ch.chunk(Document(text))
    assert all(len(c.content) <= 100 for c in chunks)
    assert "".join(c.content for c in chunks) == text


def test_fixed_size_windows():
    text = "abcdefghij" * 10  # 100 chars
    ch = FixedSizeChunker(chunk_size=40, overlap=10)
    chunks = ch.chunk(Document(text))
    assert chunks[0].start_offset == 0
    assert chunks[1].start_offset == 30  # step = 30
    assert all(len(c.content) <= 40 for c in chunks)
    assert chunks[-1].end_offset == 100


def test_sentence_chunker_window_and_overlap():
    text = "One. Two. Three. Four. Five. Six."
    ch = SentenceChunker(max_sentences=2, overlap=1)
    chunks = ch.chunk(Document(text))
    assert "One" in chunks[0].content and "Two" in chunks[0].content
    # overlap=1: second window starts at sentence "Two"
    assert chunks[1].content.startswith("Two")


def test_sentence_chunker_uppercase_boundary():
    # Boundary with no whitespace after the period, next char uppercase.
    text = "First sentence.Second sentence here. Third one."
    ch = SentenceChunker(max_sentences=1, overlap=0)
    chunks = ch.chunk(Document(text))
    assert len(chunks) == 3
    assert chunks[0].content == "First sentence."


def test_paragraph_chunker_groups():
    text = "para one\n\npara two\n\npara three\n\npara four"
    ch = ParagraphChunker(max_paragraphs=2)
    chunks = ch.chunk(Document(text))
    assert len(chunks) == 2
    assert "para one" in chunks[0].content and "para two" in chunks[0].content
    assert "para three" in chunks[1].content


def test_structural_headers_tracked():
    text = "# Top\nintro text\n## Sub\nsub text here\n# Other\nmore text"
    ch = StructuralChunker(max_section_size=512)
    chunks = ch.chunk(Document(text))
    headers = [tuple(c.metadata.headers) for c in chunks]
    assert ("Top",) in headers
    assert ("Top", "Sub") in headers
    assert ("Other",) in headers


def test_structural_oversize_section_rechunked():
    body = "word " * 300  # ~1500 chars
    text = "# Big\n" + body
    ch = StructuralChunker(max_section_size=256)
    chunks = ch.chunk(Document(text))
    assert len(chunks) > 1
    assert all("Big" in c.metadata.headers for c in chunks)
    assert all(len(c.content) <= 256 + 50 for c in chunks)


def test_structural_preamble_without_header():
    text = "no header preamble\n\n# H1\nsection text"
    chunks = StructuralChunker().chunk(Document(text))
    assert chunks[0].metadata.headers == []
    assert "preamble" in chunks[0].content


def test_semantic_chunker_splits_on_dissimilarity():
    emb = MockEmbedder(64)
    ch = SemanticChunker(emb, similarity_threshold=0.99, max_chunk_size=10_000)
    # MockEmbedder vectors for different sentences are ~orthogonal, so a
    # very high threshold forces one chunk per sentence.
    text = "Alpha sentence one. Beta sentence two. Gamma sentence three."
    chunks = ch.chunk(Document(text))
    assert len(chunks) == 3


def test_semantic_chunker_merges_identical_sentences():
    emb = MockEmbedder(64)
    ch = SemanticChunker(emb, similarity_threshold=0.99, max_chunk_size=10_000)
    text = "Same words here. Same words here. Same words here."
    chunks = ch.chunk(Document(text))
    assert len(chunks) == 1


def test_strategy_roundtrip_and_build():
    for strat in [
        ChunkingStrategy.recursive(128, 16),
        ChunkingStrategy.fixed_size(128, 16),
        ChunkingStrategy.sentence(3, 1),
        ChunkingStrategy.paragraph(2),
        ChunkingStrategy.structural(256),
    ]:
        d = strat.to_dict()
        back = ChunkingStrategy.from_dict(d)
        assert back == strat
        chunker = back.build()
        assert chunker.chunk(_doc())
    sem = ChunkingStrategy.semantic(0.7, 256)
    assert sem.from_dict(sem.to_dict()).build(MockEmbedder(16)).chunk(_doc())


@settings(max_examples=40, deadline=None)
@given(
    text=st.text(
        alphabet=st.characters(whitelist_categories=("L", "N", "P", "Zs"), whitelist_characters="\n"),
        min_size=1,
        max_size=2000,
    ),
    chunk_size=st.integers(min_value=16, max_value=256),
)
# pinned: multi-byte chars around split points (byte-vs-char offset
# bugs), separator-only tails, and repeated separators
@example(text="caf\u00e9 " * 40, chunk_size=16)
@example(text="a\n\n\n\nb\n\n\n\nc", chunk_size=16)
@example(text="\u4f60\u597d\u4e16\u754c\u3002" * 30, chunk_size=20)
def test_property_recursive_exact_substrings(text, chunk_size):
    doc = Document(text)
    ch = RecursiveChunker(chunk_size=chunk_size, overlap=min(8, chunk_size - 1))
    if not text.strip():
        with pytest.raises(EmptyDocumentError):
            ch.chunk(doc)
        return
    chunks = ch.chunk(doc)
    for c in chunks:
        assert c.content == text[c.start_offset : c.end_offset]
        assert c.content.strip()
    # ids unique
    assert len({c.id for c in chunks}) == len(chunks)


@settings(max_examples=40, deadline=None)
@given(text=st.text(min_size=1, max_size=1500), size=st.integers(32, 200))
def test_property_fixed_size_bounds(text, size):
    doc = Document(text)
    ch = FixedSizeChunker(chunk_size=size, overlap=size // 4)
    if not text.strip():
        with pytest.raises(EmptyDocumentError):
            ch.chunk(doc)
        return
    chunks = ch.chunk(doc)
    assert all(len(c.content) <= size for c in chunks)
    assert all(c.content == text[c.start_offset : c.end_offset] for c in chunks)


def test_estimate_chunks_positive():
    doc = _doc()
    for ch in ALL_CHUNKERS:
        assert ch.estimate_chunks(doc) >= 1
