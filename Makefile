# Quality gates (the reference drives these through cargo/nextest; here
# pytest + the bench harness).

PY ?= python
# pytest-xdist workers: one per CPU on multi-core machines; plain
# serial pytest on a 1-CPU box (this dev box!) where worker processes
# only add overhead. Override with `make test WORKERS=4`.
NPROC := $(shell nproc 2>/dev/null || echo 1)
WORKERS ?= $(if $(filter 1,$(NPROC)),0,auto)
XDIST := $(if $(filter 0,$(WORKERS)),,-n $(WORKERS))

.PHONY: test test-fast bench examples lint dryrun quality

test:
	$(PY) -m pytest tests/ -q $(XDIST)

test-fast:
	$(PY) -m pytest tests/ -q -x -m "not slow" --timeout=120

bench:
	$(PY) bench.py

examples:
	@# PYTHONPATH=. drops the axon sitecustomize, but JAX_PLATFORMS=axon may
	@# still be exported in the environment; pin CPU (examples are demos —
	@# auto-pick would also probe the half-configured libtpu, noisily).
	@for ex in examples/*.py; do \
		echo "== $$ex"; PYTHONPATH=. JAX_PLATFORMS=cpu $(PY) $$ex > /dev/null || exit 1; \
	done; echo "all examples OK"

dryrun:
	$(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

profile:
	PYTHONPATH=.:$$PYTHONPATH $(PY) benches/device_profile.py

microbench:
	PYTHONPATH=.:$$PYTHONPATH $(PY) benches/micro.py

lint:
	$(PY) -m compileall -q trueno_rag_tpu tests benches examples tools bench.py __graft_entry__.py
	$(PY) tools/lint.py

quality:
	@# reproduces QUALITY.md: trains the encoder on a cross-lexical
	@# synthetic corpus and scores retrieval vs the hash/untrained
	@# baselines (CPU, ~7 min; asserts trained > baseline + 0.2)
	PYTHONPATH=.:$$PYTHONPATH PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
		$(PY) -u tools/quality_eval.py

ref-baseline:
	@# measured reference-equivalent baseline (C++ port of the
	@# reference's scalar algorithms; see benches/reference_native/)
	g++ -O2 -std=c++17 -o /tmp/ref_equiv benches/reference_native/ref_equiv.cpp
	/tmp/ref_equiv

bench-compile:
	@# mirror of the reference CI's `cargo bench --no-run`: benches must
	@# at least parse/compile even when no device time is spent
	$(PY) -m compileall -q benches bench.py
	@echo "benches compile OK"
