"""Checkpoint/resume and tracing hooks."""

import os

import jax.numpy as jnp
import numpy as np

from tpuflow.models.tvl1 import tvl1_multiscale
from tpuflow.utils.checkpoint import (
    checkpoint_callback,
    load_level_checkpoint,
)


def test_checkpoint_and_resume(solver_goldens, tmp_path):
    g = solver_goldens
    I0, I1 = jnp.asarray(g["I0"]), jnp.asarray(g["I1"])
    ckpt = str(tmp_path / "ckpt")
    u_full, v_full = tvl1_multiscale(I0, I1, nscales=3, clamp_scales=False,
                                     level_callback=checkpoint_callback(ckpt))
    assert sorted(os.listdir(ckpt)) == [
        "level_00.npz", "level_01.npz", "level_02.npz"]

    # resume from the coarsest saved level; must reproduce the full run
    state = load_level_checkpoint(ckpt, 2)
    u_res, v_res = tvl1_multiscale(I0, I1, nscales=3, clamp_scales=False,
                                   resume=(2, state["u1"], state["u2"]))
    np.testing.assert_allclose(np.asarray(u_res), np.asarray(u_full),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(v_res), np.asarray(v_full),
                               atol=1e-12)

    # auto-pick finest level
    scale, st = load_level_checkpoint(ckpt)
    assert scale == 0
    np.testing.assert_allclose(st["u1"], np.asarray(u_full), atol=1e-12)
