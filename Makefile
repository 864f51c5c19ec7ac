# Test/lint/package gate (reference .travis.yml:34-39 / appveyor.yml:28
# equivalent). tests/conftest.py forces the virtual 8-device CPU mesh, so
# `make test` needs no accelerator; `make bench` needs the TPU chip.

PY ?= python

.PHONY: test lint bench sdist install-check all

all: lint test

test:
	$(PY) -m pytest tests/ -q

lint:
	@$(PY) -m flake8 --version >/dev/null 2>&1 \
	  && $(PY) -m flake8 deepvoice3_pytorch_tpu tests *.py tools \
	  || { echo "flake8 not installed; byte-compile sweep only"; \
	       $(PY) -m compileall -q deepvoice3_pytorch_tpu tests tools \
	           train.py synthesis.py preprocess.py bench.py; }

# bench.py's stdout contract: exactly one compact JSON line (full detail
# lands in BENCH.json). The pipe check fails the target if the line ever
# stops parsing or stderr chatter leaks onto stdout.
bench:
	$(PY) bench.py | tail -1 | $(PY) -c "import json,sys; \
	  r=json.load(sys.stdin); print('bench ok:', r['metric'], r['value'])"
	@$(PY) -c "import json; json.load(open('BENCH.json')); \
	  print('BENCH.json ok')"

sdist:
	bash release.sh

# Prove the sdist installs and works: pip-install it into a scratch venv
# (offline: --no-index; deps come from the parent env via
# --system-site-packages), resolve the console scripts, then synthesize
# audio end-to-end on CPU from OUTSIDE the repo so the installed package
# (not the checkout) is what runs.
VENV := /tmp/dv3_install_venv
# the parent interpreter may itself live in a venv (whose packages a
# grandchild venv does NOT inherit) — link its site-packages explicitly
SITE := $(shell $(PY) -c "import sysconfig; print(sysconfig.get_paths()['purelib'])")
install-check: sdist
	rm -rf $(VENV)
	$(PY) -m venv $(VENV)
	$(VENV)/bin/python -c "import sysconfig; \
	  open(sysconfig.get_paths()['purelib'] + '/_parent_env.pth', 'w')\
	  .write('$(SITE)\n')"
	$(VENV)/bin/pip install --no-index --no-deps --no-build-isolation \
	  dist/deepvoice3_pytorch_tpu-*.tar.gz
	cd /tmp && $(VENV)/bin/dv3-serve --help > /dev/null
	cd /tmp && $(VENV)/bin/dv3-synthesis --help > /dev/null \
	  || true  # docopt --help exits 0 or 1 by version; presence is the test
	cd /tmp && JAX_PLATFORMS=cpu $(VENV)/bin/python \
	  $(CURDIR)/tools/install_check.py
	@echo "install-check passed"
