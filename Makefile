# Convenience targets. The native library also auto-builds on first import
# (dexnerf_tpu/ops/native/__init__.py); this just makes it explicit.

NATIVE_SRC := dexnerf_tpu/ops/native/dexnerf_host.cc
NATIVE_SO  := dexnerf_tpu/ops/native/libdexnerf_host.so

.PHONY: all native test bench entry quality-guard clean

all: native

native: $(NATIVE_SO)

$(NATIVE_SO): $(NATIVE_SRC)
	g++ -O3 -march=native -shared -fPIC -std=c++17 $< -o $@

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

entry:
	python __graft_entry__.py

# TPU: fixed-seed convergence bands per train path (docs/QUALITY_BANDS.json)
quality-guard:
	python tools/quality_guard.py

clean:
	rm -f $(NATIVE_SO)
	find . -name __pycache__ -type d -exec rm -rf {} +
