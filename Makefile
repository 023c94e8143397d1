# Developer entry points.

.PHONY: install native test test-all eval bench lint clean

install:
	pip install -e . --no-deps --no-build-isolation

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -q -m "not slow and not external and not tpu"

test-all:
	python -m pytest tests/ -q

# Ranking-quality gate: the synthetic eval plants each query's answer, so
# hybrid recall@10 sits near 1.0 by construction — a drop below the floor
# means fusion/selection regressed, not that the corpus got harder.
eval:
	python scripts/eval_retrieval.py --n 2000 --dim 64 --queries 128 \
		--min-recall10 0.95

bench:
	python bench.py

lint:
	@if command -v ruff >/dev/null 2>&1; then \
		ruff check lean_explore_tpu tests scripts bench.py __graft_entry__.py; \
	else \
		echo "ruff unavailable; running syntax check only"; \
		python -m compileall -q lean_explore_tpu tests scripts bench.py __graft_entry__.py; \
	fi

clean:
	$(MAKE) -C native clean
	rm -rf build dist *.egg-info .pytest_cache
