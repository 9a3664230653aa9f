# Build / QA entry points (parity with the reference's Makefile: lint / fmt,
# plus native build, tests and benchmark).

.PHONY: all native test lint fmt bench clean

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

lint:
	python -m compileall -q event_based_bos_tpu bench.py __graft_entry__.py
	@if python -c "import mypy" >/dev/null 2>&1; then \
		python -m mypy event_based_bos_tpu; \
	else \
		echo "mypy not installed; running in-repo static lint"; \
		python tools/lint.py; \
	fi

fmt:
	@command -v black >/dev/null 2>&1 && black event_based_bos_tpu tests bench.py __graft_entry__.py || echo "black not installed; skipping"

bench: native
	python bench.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
