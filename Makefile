# Snapshot gate: run before every end-of-round commit (and any commit that
# touches the render path). A red suite must never ship.
#
# Tiers (single core; nproc=1 here makes xdist useless — tiering, not
# parallelism, keeps the gate usable under deadline):
#   make gate   — 12:50 measured (262 tests, 2026-08-21): every subsystem's core correctness (ops/raster
#                 fixed-function + parts, rendergraph, rhi, core, asset,
#                 engine, viewer, one golden smoke). Run between edits and
#                 before any commit touching the render path.
#   make check  — exhaustive: the full suite + graft entry. ~94 min wall
#                 (664 tests, measured 2026-08-21, cache/suite_r5.log).
#                 Gate every end-of-round snapshot on this.
#   make quick  — ~2 min core sanity while iterating.
.PHONY: check test gate quick bench entry

check: test entry
	@echo "check: suite green + graft entry compiles"

test:
	python -m pytest tests/ -q

# Broad-but-fast tier: every subsystem represented, heavyweight scene
# e2e / SPMD bit-equality / golden-corpus files stay in `make check`.
GATE_FILES = tests/test_math.py tests/test_camera.py tests/test_input.py \
  tests/test_native.py tests/test_dds.py tests/test_asset.py \
  tests/test_rhi.py tests/test_vertex_inputs.py tests/test_texture_types.py \
  tests/test_raster.py tests/test_fixedfunc.py tests/test_lines_points.py \
  tests/test_stencil.py tests/test_raster_parts.py \
  tests/test_rendergraph.py tests/test_subresource.py tests/test_blend_e2e.py \
  tests/test_engine.py tests/test_viewer.py tests/test_golden.py

gate:
	python -m pytest $(GATE_FILES) -q

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
