# Test tiers (VERDICT r2 item 7) and common dev targets.
#
#   make test-fast    unit/property subset, minutes on the 1-core CPU host
#   make test         full default suite (CPU, 8 virtual devices; ~20-40 min
#                     on this host — compile-bound, fast on many-core CPUs)
#   make test-quality end-to-end quality thresholds under pytest (CPU-forced;
#                     multi-minute). On TPU use `make check` instead.
#   make check        ON-DEVICE quality gate: reduced E-SHD/AUROC thresholds
#                     on the default backend (seconds-to-a-minute on TPU).
#                     This is the gate that should run by default on TPU.
#   make native       build the C++ graph library
#   make warm         pre-compile fused kernels for the benchmark shapes

PY ?= python

test-fast:
	$(PY) -m pytest tests/ -q -m "not heavy and not slow" -p no:cacheprovider

test:
	$(PY) -m pytest tests/ -q -p no:cacheprovider

test-quality:
	DIBS_RUN_SLOW=1 $(PY) -m pytest tests/test_quality.py -q -p no:cacheprovider

check:
	$(PY) scripts/quality_gate.py

native:
	$(MAKE) -C dibs_tpu/native

warm:
	$(PY) scripts/prime_cache.py --d 20 30

bench:
	$(PY) bench.py

.PHONY: test-fast test test-quality check native warm bench
