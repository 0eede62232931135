# Snapshot gate: run before every end-of-round commit (and any commit that
# touches the render path). A red suite must never ship — `make check` is
# the builder's discipline, the tally lands in NEXT.md.
.PHONY: check test quick bench entry

check: test entry
	@echo "check: suite green + graft entry compiles"

test:
	python -m pytest tests/ -q

# The fast correctness core (~2 min): run between edits.
quick:
	python -m pytest tests/test_raster.py tests/test_fixedfunc.py \
	  tests/test_rendergraph.py tests/test_input.py tests/test_camera.py \
	  tests/test_viewer.py -q

# Driver-facing surfaces must at least import + trace.
entry:
	python -c "import __graft_entry__ as g; fn, args = g.entry(); print('entry ok')"

# TPU only — one JSON line (the driver's headline metric).
bench:
	python bench.py
