"""IN-PROCESS CLI tests: `cli.main(argv)` called directly.

tests/test_cli.py exercises the CLI black-box through subprocesses —
the right test for the entry-point contract, but (a) a subprocess per
case is the suite's slowest pattern on this box and (b) subprocess
lines are invisible to in-process coverage (tools/linecov.py's
documented lower bound). These tests drive the same subcommand
functions in-process: argument wiring, artifact round-trips, output
formats, and error exits — complementary to (not a replacement for)
the black-box suite.
"""

from __future__ import annotations

import json

import pytest

from trueno_rag_tpu import cli


def _write_docs(tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    (d / "fox.txt").write_text(
        "The quick brown fox jumps over the lazy dog. "
        "Foxes are clever wild animals living in forests."
    )
    (d / "tpu.txt").write_text(
        "Tensor processing units multiply matrices quickly. "
        "Machine learning models process large data sets on accelerators."
    )
    return d


def test_info_prints_version_and_platform(capsys):
    assert cli.main(["info"]) == 0
    out = capsys.readouterr().out
    import trueno_rag_tpu

    assert trueno_rag_tpu.__version__ in out


def test_demo_runs_end_to_end(capsys):
    assert cli.main(["demo", "--top-k", "2"]) == 0
    out = capsys.readouterr().out
    assert "Hybrid" in out or "hybrid" in out


def test_index_then_query_roundtrip(tmp_path, capsys):
    docs = _write_docs(tmp_path)
    idx = tmp_path / "idx"
    assert cli.main([
        "index", "--path", str(docs), "--output", str(idx),
        "--dimension", "64", "--chunk-size", "128",
    ]) == 0
    capsys.readouterr()
    assert cli.main([
        "query", "fox forests", "--index", str(idx), "--top-k", "2",
    ]) == 0
    out = capsys.readouterr().out
    assert "fox" in out.lower()
    # JSON format carries machine-readable scores
    assert cli.main([
        "query", "tensor matrices", "--index", str(idx), "--top-k", "2",
        "--format", "json",
    ]) == 0
    payload = json.loads(capsys.readouterr().out)
    assert payload and isinstance(payload, list)


def test_index_single_file_and_tagged_query(tmp_path, capsys):
    docs = _write_docs(tmp_path)
    idx = tmp_path / "idx2"
    assert cli.main([
        "index", "--path", str(docs), "--output", str(idx),
        "--dimension", "64", "--tag-by-dir",
    ]) == 0
    capsys.readouterr()
    assert cli.main([
        "query", "fox", "--index", str(idx), "--filter-all", "docs",
    ]) == 0
    assert capsys.readouterr().out.strip()
    # a filter naming an unknown tag returns no results, not a crash
    assert cli.main([
        "query", "fox", "--index", str(idx), "--filter-all", "nope",
    ]) == 0


def test_query_missing_index_is_loud(tmp_path):
    with pytest.raises(SystemExit):
        cli.main(["query", "x", "--index", str(tmp_path / "absent")])


def test_index_semantic_embedder_unknown_model_is_loud(tmp_path):
    docs = _write_docs(tmp_path)
    with pytest.raises(SystemExit):
        cli.main([
            "index", "--path", str(docs), "--output", str(tmp_path / "o"),
            "--embedder", "semantic", "--model", "not-a-model",
        ])


def test_index_learned_sparse_roundtrip(tmp_path, capsys):
    docs = _write_docs(tmp_path)
    idx = tmp_path / "idx3"
    assert cli.main([
        "index", "--path", str(docs), "--output", str(idx),
        "--dimension", "64", "--learned-sparse",
    ]) == 0
    capsys.readouterr()
    assert cli.main([
        "query", "accelerators", "--index", str(idx), "--top-k", "2",
    ]) == 0
    assert capsys.readouterr().out.strip()
