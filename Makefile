PY ?= python

.PHONY: all native test bench clean

all: native

native:
	$(PY) setup.py build_ext --inplace

test:
	$(PY) -m pytest tests/ -x -q

bench:
	$(PY) bench.py

clean:
	rm -rf build cymf_tpu/native/_native*.so cymf_tpu/__pycache__
