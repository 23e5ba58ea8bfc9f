# Mosaic capability probes for the round-3 kernel redesign:
#  1. lax.while_loop with data-dependent trip count inside a kernel
#  2. pltpu.roll with a traced (runtime) shift
#  3. pl.when over two heavy compute branches
#  4. dynamic-start pl.ds slice of a VMEM scratch window
import sys, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuflow-jax-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def probe(name, fn):
    try:
        fn()
        print(f"{name}: OK", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


# --- 1. while_loop in kernel ---
def k_while(x_ref, o_ref):
    def cond(c):
        s, n = c
        return (jnp.max(jnp.abs(s)) > 1e-3) & (n < 100)

    def body(c):
        s, n = c
        return s * 0.5, n + 1

    s, n = jax.lax.while_loop(cond, body, (x_ref[:], 0))
    o_ref[:] = s + n.astype(jnp.float32)


def t_while():
    x = jnp.ones((8, 128), jnp.float32)
    out = pl.pallas_call(k_while,
                         out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x)
    v = np.asarray(out)
    assert abs(v[0, 0] - (2.0 ** -10 + 10)) < 1e-5, v[0, 0]


probe("while_loop", t_while)


# --- 2. dynamic roll ---
def k_roll(s_ref, x_ref, o_ref):
    sh = s_ref[0]
    o_ref[:] = pltpu.roll(x_ref[:], shift=sh, axis=1)


def t_roll():
    x = jnp.asarray(np.arange(8 * 256, dtype=np.float32).reshape(8, 256))
    s = jnp.asarray([5], jnp.int32)
    out = pl.pallas_call(
        k_roll,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32))(s, x)
    np.testing.assert_allclose(np.asarray(out), np.roll(np.asarray(x), 5, 1))


probe("dynamic_roll_axis1", t_roll)


def k_roll0(s_ref, x_ref, o_ref):
    o_ref[:] = pltpu.roll(x_ref[:], shift=s_ref[0], axis=0)


def t_roll0():
    x = jnp.asarray(np.arange(64 * 128, dtype=np.float32).reshape(64, 128))
    s = jnp.asarray([3], jnp.int32)
    out = pl.pallas_call(
        k_roll0,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32))(s, x)
    np.testing.assert_allclose(np.asarray(out), np.roll(np.asarray(x), 3, 0))


probe("dynamic_roll_axis0", t_roll0)


# --- 3. pl.when two branches writing out ---
def k_when(x_ref, o_ref):
    big = jnp.sum(x_ref[:]) > 100.0

    @pl.when(big)
    def _():
        o_ref[:] = x_ref[:] * 2.0

    @pl.when(jnp.logical_not(big))
    def _():
        o_ref[:] = x_ref[:] * 3.0


def t_when():
    x = jnp.ones((8, 128), jnp.float32)
    out = pl.pallas_call(k_when,
                         out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x)
    np.testing.assert_allclose(np.asarray(out), 2.0)


probe("pl_when", t_when)


# --- 4. dynamic-start slice of VMEM scratch ---
def k_ds(x_ref, o_ref):
    start = jnp.asarray(jnp.sum(x_ref[0, :8]), jnp.int32)  # == 8 at runtime
    o_ref[:] = x_ref[pl.ds(4, 8), pl.ds(start, 128)]


def t_ds():
    x = jnp.asarray(np.arange(16 * 256, dtype=np.float32).reshape(16, 256))
    x = x.at[0, :8].set(1.0)
    out = pl.pallas_call(k_ds,
                         out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x)[4:12, 8:136])


probe("dynamic_slice_lane", t_ds)
