# Build/test entry points (reference: CMake + `make bttest`,
# zklaim/CMakeLists.txt:110-116; CI runs Dockerfile:10-12).
#
#   make native      build the C++ host library (SHA256/Ed25519-ECDSA/codec)
#   make test-fast   native + host-side suite, no heavy XLA compiles (<5 min)
#   make test        native + the full CPU suite (compile-heavy; slow cold)
#   make test-tpu    E2E parity suite on real TPU hardware
#   make bench       the driver benchmark line (real TPU)

PYTHON ?= python

.PHONY: native test-fast test test-tpu bench clean

native:
	$(MAKE) -C native

test-fast: native
	$(PYTHON) -m pytest tests/ -q -m "not slow and not tpu"

test: native
	$(PYTHON) -m pytest tests/ -q

test-tpu: native
	ZKLAIM_TEST_PLATFORM=tpu $(PYTHON) -m pytest tests/ -q -m "tpu" \
	    tests/test_e2e_parity.py

bench:
	$(PYTHON) bench.py

clean:
	$(MAKE) -C native clean
