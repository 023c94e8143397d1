# Developer entry points.

.PHONY: install native test test-all bench lint clean

install:
	pip install -e . --no-deps --no-build-isolation

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -q -m "not slow and not external and not tpu"

test-all:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	$(MAKE) -C native clean
	rm -rf build dist *.egg-info .pytest_cache
