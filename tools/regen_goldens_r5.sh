#!/bin/bash
# Regenerate the GI goldens at raised reference sample counts (VERDICT r5
# item 3: tighten parity bands by averaging reference noise out of the
# goldens; our test renders stay at the scene's spp via _compare(spp=...)).
# Usage: bash tools/regen_goldens_r5.sh [/tmp/refbuild]
set -e
REF=${1:-/tmp/refbuild}/bin/pbrt
HERE="$(cd "$(dirname "$0")/.." && pwd)"
WORK=$(mktemp -d)
render() { # scene golden spp
  sed "s/\"integer pixelsamples\" \[[0-9]*\]/\"integer pixelsamples\" [$3]/" \
    "$HERE/scenes/$1" > "$WORK/$1"
  (cd "$WORK" && PBRT_SEARCHPATH="$(dirname "$REF")" "$REF" "$1")
  cp "$WORK/$2" "$HERE/scenes/$2"
  echo "regenerated $2 at $3 spp"
}
render config3.pbrt golden3.exr 256
render config8.pbrt golden8.exr 32
render config9.pbrt golden9.exr 32
render config10.pbrt golden10.exr 128
rm -rf "$WORK"
