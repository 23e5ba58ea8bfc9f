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
    # Make the oracle deterministic: the reference's Solver_wrt_chi uses
    # its static eta buffers UNINITIALIZED on first call (its own
    # "#warning eta1 and eta2 are used uninitialized",
    # tvl1occflow_solvers.cpp:262) — golden outputs would depend on heap
    # garbage.  Zero-initialize them (the intended fresh-allocation
    # behavior) so goldens are reproducible.
    python3 - "$BUILD/src/tvl1occflow_solvers.cpp" <<'PYEOF'
import sys
p = sys.argv[1]
src = open(p).read()
old = """        eta1 = new ofpix_t[nx * ny];
        eta2 = new ofpix_t[nx * ny];"""
new = old + """
        for (int z = 0; z < nx * ny; z++) { eta1[z] = 0.0; eta2[z] = 0.0; }"""
assert old in src, "eta allocation site not found"
open(p, "w").write(src.replace(old, new, 1))
PYEOF
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
