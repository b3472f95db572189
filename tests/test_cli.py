"""CLI black-box tests: spawn the real entry point and assert on
stdout/stderr/exit codes, mirroring the reference's assert_cmd tier
(crates/trueno-rag-cli/tests/cli_tests.rs:155-307), including failure
modes (missing path, missing index) and JSON output."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args, cwd=None):
    env = dict(os.environ)
    # Disable the axon TPU registration for subprocesses (its gate env
    # var) and force CPU; keeps CLI tests hermetic and fast.
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", "trueno_rag_tpu.cli", *args],
        capture_output=True,
        text=True,
        env=env,
        cwd=cwd or REPO,
        timeout=300,
    )


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    (d / "rag.txt").write_text(
        "Retrieval augmented generation grounds language models in retrieved "
        "documents. Chunking splits documents into indexable pieces."
    )
    (d / "tpu.md").write_text(
        "# TPU\nTensor processing units accelerate matrix multiplication. "
        "The MXU is a systolic array fed from HBM."
    )
    (d / "ignored.py").write_text("print('not indexed')")
    return d


def test_info():
    r = run_cli("info")
    assert r.returncode == 0
    assert "trueno-rag-tpu v" in r.stdout
    assert "components:" in r.stdout
    assert "fusion: rrf" in r.stdout


def test_demo_default():
    r = run_cli("demo")
    assert r.returncode == 0
    assert "indexed 4 documents" in r.stdout
    assert "assembled context" in r.stdout
    assert "[1]" in r.stdout  # citations rendered
    assert "Hybrid Search" in r.stdout


def test_demo_custom_query_topk():
    r = run_cli("demo", "--query", "what is BM25 sparse retrieval", "--top-k", "2")
    assert r.returncode == 0
    assert "query: what is BM25 sparse retrieval" in r.stdout
    assert "Sparse Retrieval" in r.stdout


def test_index_then_query_text(corpus_dir, tmp_path):
    out = tmp_path / "idx"
    r = run_cli("index", "--path", str(corpus_dir), "--output", str(out))
    assert r.returncode == 0, r.stderr
    assert "indexed 2 documents" in r.stdout
    assert (out / "index.trag").exists()

    q = run_cli("query", "systolic array matrix", "--index", str(out))
    assert q.returncode == 0, q.stderr
    assert "tpu.md" in q.stdout


def test_index_single_file_and_json_output(corpus_dir, tmp_path):
    out = tmp_path / "idx1"
    r = run_cli(
        "index", "--path", str(corpus_dir / "rag.txt"), "--output", str(out),
        "--chunk-size", "128", "--chunk-overlap", "16",
    )
    assert r.returncode == 0, r.stderr

    q = run_cli("query", "chunking documents", "--index", str(out), "--format", "json")
    assert q.returncode == 0, q.stderr
    data = json.loads(q.stdout)
    assert isinstance(data, list) and data
    assert data[0]["rank"] == 1
    assert "content" in data[0] and "score" in data[0]


def test_query_scan_tier_flag_matches_default(corpus_dir, tmp_path):
    """--scan-tier compact loads the artifact into a compact store
    (certified sets + filter-aware host patch) — query results must
    match the default fp32 load."""
    out = tmp_path / "idx_tier"
    r = run_cli("index", "--path", str(corpus_dir), "--output", str(out))
    assert r.returncode == 0, r.stderr

    base = run_cli("query", "systolic array matrix", "--index", str(out),
                   "--format", "json")
    tier = run_cli("query", "systolic array matrix", "--index", str(out),
                   "--format", "json", "--scan-tier", "compact")
    assert base.returncode == 0 and tier.returncode == 0, tier.stderr
    b, t = json.loads(base.stdout), json.loads(tier.stdout)
    assert [x["content"] for x in b] == [x["content"] for x in t]
    assert [x["score"] for x in b] == pytest.approx([x["score"] for x in t],
                                                    abs=1e-5)


def test_index_multi_vector_then_query(corpus_dir, tmp_path):
    """index --multi-vector writes a token-index artifact that query
    auto-detects (seed-0 encoder identity); rankings are model-defined
    so only the contract is asserted."""
    out = tmp_path / "mv"
    r = run_cli("index", "--path", str(corpus_dir), "--output", str(out),
                "--multi-vector")
    assert r.returncode == 0, r.stderr
    assert "(multi-vector)" in r.stdout
    assert (out / "token_index.trag").exists()
    assert not (out / "index.trag").exists()

    q = run_cli("query", "systolic array matrix", "--index", str(out),
                "--format", "json")
    assert q.returncode == 0, q.stderr
    data = json.loads(q.stdout)
    assert isinstance(data, list) and data
    assert data[0]["rank"] == 1 and "content" in data[0]


def test_index_learned_sparse_then_query(corpus_dir, tmp_path):
    """index --learned-sparse writes a splade-index artifact that query
    auto-detects; scores surface as sparse_score."""
    out = tmp_path / "ls"
    r = run_cli("index", "--path", str(corpus_dir), "--output", str(out),
                "--learned-sparse")
    assert r.returncode == 0, r.stderr
    assert "(learned-sparse" in r.stdout
    assert (out / "splade_index.trag").exists()

    q = run_cli("query", "systolic array matrix", "--index", str(out),
                "--format", "json")
    assert q.returncode == 0, q.stderr
    data = json.loads(q.stdout)
    assert isinstance(data, list) and data
    assert data[0]["sparse_score"] is not None
    assert data[0]["sparse_score"] > 0


def test_index_multi_vector_and_learned_sparse_exclusive(corpus_dir, tmp_path):
    r = run_cli("index", "--path", str(corpus_dir),
                "--output", str(tmp_path / "x"),
                "--multi-vector", "--learned-sparse")
    assert r.returncode != 0
    assert "mutually exclusive" in (r.stderr + r.stdout)


def test_index_nonexistent_path_fails(tmp_path):
    r = run_cli("index", "--path", str(tmp_path / "nope"), "--output", str(tmp_path / "o"))
    assert r.returncode != 0
    assert "does not exist" in (r.stderr + r.stdout)


def test_query_missing_index_fails(tmp_path):
    r = run_cli("query", "anything", "--index", str(tmp_path))
    assert r.returncode != 0
    assert "no index found" in (r.stderr + r.stdout)


def test_unknown_command_fails():
    r = run_cli("frobnicate")
    assert r.returncode != 0


def test_index_with_learned_sparse_tri_hybrid(corpus_dir, tmp_path):
    """--with-learned-sparse builds a TRI-hybrid artifact (dense + BM25
    + learned expansions inside index.trag); query re-attaches the
    learned source automatically and surfaces learned_score."""
    out = tmp_path / "tri"
    r = run_cli("index", "--path", str(corpus_dir), "--output", str(out),
                "--with-learned-sparse")
    assert r.returncode == 0, r.stderr
    assert (out / "index.trag").exists()
    assert not (out / "splade_index.trag").exists()

    q = run_cli("query", "systolic array matrix", "--index", str(out),
                "--format", "json")
    assert q.returncode == 0, q.stderr
    data = json.loads(q.stdout)
    assert isinstance(data, list) and data
    assert data[0]["fused_score"] is not None
    assert any(row["learned_score"] is not None for row in data)

    # tag filters ride the tri path too
    r2 = run_cli("index", "--path", str(corpus_dir), "--output", str(out),
                 "--with-learned-sparse", "--tag-by-dir", "--tags", "docs")
    assert r2.returncode == 0, r2.stderr
    qf = run_cli("query", "systolic array matrix", "--index", str(out),
                 "--filter-all", "docs", "--format", "json")
    assert qf.returncode == 0, qf.stderr
    assert json.loads(qf.stdout)


def test_with_learned_sparse_excludes_other_modes(corpus_dir, tmp_path):
    r = run_cli("index", "--path", str(corpus_dir),
                "--output", str(tmp_path / "x"),
                "--learned-sparse", "--with-learned-sparse")
    assert r.returncode != 0
    assert "cannot combine" in (r.stderr + r.stdout)
