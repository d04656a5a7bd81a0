# legommenders_tpu — CI entry points.
# All targets run CPU-only (8-device virtual mesh via tests/conftest.py);
# bench targets that need the real TPU are NOT in `ci`.

PY ?= python
CPU := JAX_PLATFORM_NAME=cpu

.PHONY: ci test test-all smoke bench-smoke scaling lint

ci: test-all smoke bench-smoke scaling

# fast set (<5 min): excludes the multi-minute `slow`-marked suites
# (parallel/catalog/lm_ops/golden/multihost/CLI-subprocess)
test:
	$(CPU) $(PY) -m pytest tests/ -x -q -m "not slow"

# the full suite (what CI runs)
test-all:
	$(CPU) $(PY) -m pytest tests/ -x -q

# end-to-end CLI smoke: process -> train 2 epochs on synthetic
smoke:
	$(CPU) $(PY) process.py --data synthetic
	$(CPU) $(PY) trainer.py --data synthetic --model naml --epoch 2 \
	  --epoch_batch 4 --batch_size 16 --hidden_size 16

# tiny-shape LM bench path (compiles + runs, no perf assertion)
bench-smoke:
	$(CPU) $(PY) bench_lm.py --smoke 1

# dp/mp/sp scaling sweep on the virtual 8-device mesh
scaling:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 $(CPU) $(PY) scaling.py

lint:
	$(PY) -m compileall -q legommenders_tpu tests *.py
