"""`horn_schunck_classic` CLI — mirrors reference
src/horn_schunck_classic_main.cpp.

Usage: python -m tpuflow.cli.horn_schunck_classic niter alpha a b f
"""

import sys

import jax.numpy as jnp

from tpuflow.cli.common import enable_persistent_cache, load_pair, save_flow
from tpuflow.models.hs_classic import hs_classic_jit


def main(argv=None):
    enable_persistent_cache()
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 5:
        print("usage:\n\thorn_schunck_classic niter alpha a b f", file=sys.stderr)
        return 1
    niter = int(argv[0])
    alpha = float(argv[1])
    I0, I1 = load_pair(argv[2], argv[3])
    u, v = hs_classic_jit(jnp.asarray(I0), jnp.asarray(I1),
                          niter=niter, alpha=alpha)
    save_flow(argv[4], u, v)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
