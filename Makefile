# Developer gates for pecos_tpu (role of the reference Makefile's
# format/test targets; no third-party linters in this image, so lint is the
# AST checker in scripts/lint.py).

.PHONY: lint test bench dryrun

lint:
	python scripts/lint.py

test: lint
	python -m pytest tests/ -x -q

bench:
	python bench.py

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
		python __graft_entry__.py 8
