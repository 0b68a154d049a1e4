# Developer entry points.  Tests force the CPU platform (8-device virtual
# mesh); bench runs on whatever device the session exposes.

PY ?= python

.PHONY: test test-fast bench native clean

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x -k "not fuzz"

bench:
	$(PY) bench.py

native:
	rm -f matchtigs_tpu/native/_native.so
	$(PY) -c "from matchtigs_tpu import native; native.load(); print('native build ok')"

clean:
	rm -rf matchtigs_tpu/native/_native.so .jax_cache .bench_data \
	  $$(find . -name __pycache__ -type d)
