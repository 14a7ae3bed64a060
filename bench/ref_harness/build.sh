#!/bin/bash
# Build the reference omp3 backend against the arch-API shim, into /tmp.
# Usage: bench/ref_harness/build.sh [REFERENCE_DIR] [OUT_DIR]
set -euo pipefail

REF=${1:-/root/reference}
OUT=${2:-/tmp/refbench}
HERE=$(cd "$(dirname "$0")" && pwd)

mkdir -p "$OUT" "$HERE/a/b"

# Relative-include resolution: reference sources include "../comms.h" and
# "../../comms.h"; -I$HERE/a and -I$HERE/a/b make those resolve to $HERE/*.h.
CFLAGS="-O3 -march=native -fopenmp -std=gnu99 -I$HERE/a -I$HERE/a/b -I$HERE"

gcc $CFLAGS -c "$HERE/arch_shim.c" -o "$OUT/arch_shim.o"
gcc $CFLAGS -c "$REF/main.c" -o "$OUT/main.o"
gcc $CFLAGS -c "$REF/neutral_data.c" -o "$OUT/neutral_data.o"
gcc $CFLAGS -c "$REF/omp3/neutral.c" -o "$OUT/neutral.o"
gcc $CFLAGS "$OUT"/*.o -lm -o "$OUT/neutral.omp3"

# Runtime layout: decks + cs tables + ../arch.params relative to cwd.
mkdir -p "$OUT/run/problems"
cp "$REF"/problems/*.params "$REF"/problems/neutral.tests "$OUT/run/problems/"
cp "$REF"/*.cs "$OUT/run/"
cat > "$OUT/arch.params" <<PARAMS
width 1.0
height 1.0
sim_end 1.0
PARAMS

echo "Built $OUT/neutral.omp3 (run from $OUT/run)"
