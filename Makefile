PY ?= python

.PHONY: all native test bench clean provision parity

all: native

native:
	$(PY) setup.py build_ext --inplace

test:
	$(PY) -m pytest tests/ -x -q

bench:
	$(PY) bench.py

provision:
	$(PY) scripts/provision_datasets.py

parity: provision
	$(PY) scripts/parity_ml100k.py

clean:
	rm -rf build cymf_tpu/native/_native*.so cymf_tpu/__pycache__
