# Test/lint/package gate (reference .travis.yml:34-39 / appveyor.yml:28
# equivalent). tests/conftest.py forces the virtual 8-device CPU mesh, so
# `make test` needs no accelerator; `make bench` needs the TPU chip.

PY ?= python

.PHONY: test lint bench sdist all

all: lint test

test:
	$(PY) -m pytest tests/ -q

lint:
	@$(PY) -m flake8 --version >/dev/null 2>&1 \
	  && $(PY) -m flake8 deepvoice3_pytorch_tpu tests *.py tools \
	  || { echo "flake8 not installed; byte-compile sweep only"; \
	       $(PY) -m compileall -q deepvoice3_pytorch_tpu tests tools \
	           train.py synthesis.py preprocess.py bench.py; }

bench:
	$(PY) bench.py

sdist:
	bash release.sh
