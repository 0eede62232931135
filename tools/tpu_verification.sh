#!/usr/bin/env bash
# One-shot TPU verification batch for everything added while the tunnel was
# down. Run ON the real chip (no JAX_PLATFORMS override), with nothing else
# running (single-core host; contention poisons the numbers — PERF.md).
# Each drive is its own process: device readback permanently degrades async
# dispatch within a process (PERF.md trap #5).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_verify}
mkdir -p "$OUT" docs/gallery
run() {
  name=$1; shift
  echo "== $name"
  timeout 900 python -m zenith_tpu.sandbox.scene \
    --frames 120 --out "$OUT/$name.png" -- --mode deferred --lights 100 "$@" \
    2>&1 | tail -2
}

# 1) Headline bench (driver-comparable figure).
echo "== bench.py"; timeout 1200 python bench.py

# 2) New-feature drives + gallery captures.
run scene_taa --taa
run scene_cascades --cascades 3
run scene_autoexposure --auto-exposure
run scene_skinned --skinned
run scene_morph --morph
run scene_spots --spots 3
run scene_pointshadow --point-shadows
run scene_particles --particles 256
run scene_grade --grade
run scene_dof --dof
run scene_softshadows --soft-shadows
run scene_probe --probe
run scene_everything --taa --cascades 3 --auto-exposure --skinned \
    --morph --spots 3 --particles 128 --grade --dof --soft-shadows

# 2b) Round-3 continuation #3 features (flare/sky/film/contact + terrain).
ZENITH_ORBIT_START=2.2 run scene_flare --flare
ZENITH_ORBIT_START=2.2 run scene_sky --sky
ZENITH_ORBIT_START=2.2 run scene_sunset --sky --flare --grade
run scene_film --film
run scene_contact --contact-shadows
echo "== terrain"
timeout 900 python -m zenith_tpu.sandbox.terrain \
  --frames 120 --out "$OUT/terrain.png" -- --grid 768 2>&1 | tail -2
timeout 900 python -m zenith_tpu.sandbox.terrain \
  --frames 120 --out "$OUT/terrain_2p9m.png" -- --grid 1200 2>&1 | tail -2

# 3) Feature-cost matrix (subprocess per config already).
echo "== profile_features"
timeout 7200 python tools/profile_features.py

echo "done: PNGs in $OUT — promote the good ones to docs/gallery/ and"
echo "record the numbers in PERF.md."
