# Quality gates (the reference drives these through cargo/nextest; here
# pytest + the bench harness).

PY ?= python

.PHONY: test test-fast bench examples lint dryrun

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x -m "not slow" --timeout=120

bench:
	$(PY) bench.py

examples:
	@for ex in examples/*.py; do \
		echo "== $$ex"; PYTHONPATH=. $(PY) $$ex > /dev/null || exit 1; \
	done; echo "all examples OK"

dryrun:
	$(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

profile:
	PYTHONPATH=.:$$PYTHONPATH $(PY) benches/device_profile.py

microbench:
	PYTHONPATH=.:$$PYTHONPATH $(PY) benches/micro.py

lint:
	$(PY) -m compileall -q trueno_rag_tpu tests examples bench.py __graft_entry__.py
