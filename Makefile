# Developer entry points (CI mirrors these; see .github/workflows/tests.yml)

MINUTES ?= 3

.PHONY: native test fuzz bench typecheck

native:
	$(MAKE) -C csrc

test: native
	python -m pytest tests/ -q

# time-boxed deep fuzz, the reference's 3-minute-per-push discipline
# (ref .github/workflows/tests.yml fuzz job)
fuzz: native
	python tests/deep_fuzz.py --minutes $(MINUTES)

bench:
	python bench.py

typecheck:
	mypy --strict --follow-imports=silent needletail_tpu/__init__.pyi needletail_tpu/api.pyi
	mypy needletail_tpu --ignore-missing-imports --no-warn-no-return --allow-redefinition
