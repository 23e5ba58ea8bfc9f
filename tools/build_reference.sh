#!/bin/bash
# Build the reference C++ library + binaries (from the read-only mount at
# /root/reference) in a scratch dir, then build the golden harness
# against it.  Artifacts land in /tmp/refbuild.
set -euo pipefail

REF=${REF:-/root/reference}
BUILD=${BUILD:-/tmp/refbuild}
TOOLS="$(cd "$(dirname "$0")" && pwd)"

mkdir -p "$BUILD"
if [ ! -f "$BUILD/libof.a" ]; then
    cp -r "$REF/src/." "$BUILD/src"
    make -C "$BUILD/src" CFLAGS_OPT="-Wall -O2 -fpermissive" -j"$(nproc)"
    cp "$BUILD"/src/libof.a "$BUILD"/
    for b in horn_schunck_classic horn_schunck_pyramidal brox_spatial \
             brox_temporal tvl1flow tvl1occflow robust_expo_methods; do
        cp "$BUILD/src/$b" "$BUILD/"
    done
fi

g++ -O2 -fopenmp -fpermissive -I"$BUILD/src" \
    -o "$BUILD/ref_harness" "$TOOLS/ref_harness.cpp" "$BUILD/src/libof.a" -lm
echo "built: $BUILD/ref_harness"
