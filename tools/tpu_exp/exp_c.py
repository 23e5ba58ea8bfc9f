# Variant C: whole-image-in-VMEM TV-L1 iteration kernel, grid over batch,
# standard pipelined BlockSpecs, err as (1,8,128) VMEM output per sample.
import sys, functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/tmp/tpuflow-jax-cache")

GRAD_IS_ZERO = 1e-10

def kern(state_ref, const_ref, out_ref, err_ref, *, n_iters, ny, nx, l_t, theta, taut):
    dtype = out_ref.dtype
    Hp, Wp = state_ref.shape[2], state_ref.shape[3]
    gi = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 0)
    gj = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 1)
    last_col = gj == nx - 1
    last_row = gi == ny - 1
    first_col = gj == 0
    first_row = gi == 0
    in_img = (gi < ny) & (gj < nx)
    zero = jnp.zeros((), dtype)

    iwx = const_ref[0, 0]; iwy = const_ref[0, 1]
    rho_c = const_ref[0, 2]; grad = const_ref[0, 3]
    fi = -1.0 / jnp.maximum(grad, GRAD_IS_ZERO)
    u1 = state_ref[0, 0]; u2 = state_ref[0, 1]
    p11 = state_ref[0, 2]; p12 = state_ref[0, 3]
    p21 = state_ref[0, 4]; p22 = state_ref[0, 5]

    def shift_left(a):
        return jnp.concatenate([a[:, 1:], jnp.zeros((Hp, 1), dtype)], axis=1)
    def shift_right(a):
        return jnp.concatenate([jnp.zeros((Hp, 1), dtype), a[:, :-1]], axis=1)
    def shift_up(a):
        return jnp.concatenate([a[1:], jnp.zeros((1, Wp), dtype)], axis=0)
    def shift_down(a):
        return jnp.concatenate([jnp.zeros((1, Wp), dtype), a[:-1]], axis=0)

    def divergence(pa, pb):
        a = jnp.where(last_col, zero, pa)
        bb = jnp.where(last_row, zero, pb)
        dx = a - jnp.where(first_col, zero, shift_right(a))
        dy = bb - jnp.where(first_row, zero, shift_down(bb))
        return dx + dy

    def fgrad(f):
        fx = jnp.where(last_col, zero, shift_left(f) - f)
        fy = jnp.where(last_row, zero, shift_up(f) - f)
        return fx, fy

    u1p, u2p = u1, u2
    for it in range(n_iters):
        if it == n_iters - 1:
            u1p, u2p = u1, u2
        rho = rho_c + iwx * u1 + iwy * u2
        lo = rho < -l_t * grad
        hi = rho > l_t * grad
        tiny = grad < GRAD_IS_ZERO
        mul = jnp.where(lo, l_t, jnp.where(hi, -l_t, jnp.where(tiny, zero, rho * fi)))
        v1 = u1 + mul * iwx
        v2 = u2 + mul * iwy
        u1 = v1 + theta * divergence(p11, p12)
        u2 = v2 + theta * divergence(p21, p22)
        u1x, u1y = fgrad(u1)
        u2x, u2y = fgrad(u2)
        ng1 = 1.0 / (1.0 + taut * jnp.sqrt(u1x * u1x + u1y * u1y))
        ng2 = 1.0 / (1.0 + taut * jnp.sqrt(u2x * u2x + u2y * u2y))
        p11 = (p11 + taut * u1x) * ng1
        p12 = (p12 + taut * u1y) * ng1
        p21 = (p21 + taut * u2x) * ng2
        p22 = (p22 + taut * u2y) * ng2

    out_ref[0, 0] = u1; out_ref[0, 1] = u2
    out_ref[0, 2] = p11; out_ref[0, 3] = p12
    out_ref[0, 4] = p21; out_ref[0, 5] = p22
    du = jnp.where(in_img, u1 - u1p, zero)
    dv = jnp.where(in_img, u2 - u2p, zero)
    err_ref[0] = jnp.full((8, 128), jnp.sum(du * du + dv * dv), dtype)

@functools.partial(jax.jit, static_argnames=("n_iters", "l_t", "theta", "taut"))
def tvl1_iterate_whole(state, const, n_iters, l_t, theta, taut):
    nb, _, ny, nx = state.shape
    ru = lambda x, m: -(-x // m) * m
    Hp, Wp = ru(ny, 8), ru(nx, 128)
    pad = lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, Hp - ny), (0, Wp - nx)))
    k = functools.partial(kern, n_iters=n_iters, ny=ny, nx=nx,
                          l_t=float(l_t), theta=float(theta), taut=float(taut))
    out, err = pl.pallas_call(
        k, grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 6, Hp, Wp), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, Hp, Wp), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 6, Hp, Wp), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, 6, Hp, Wp), state.dtype),
            jax.ShapeDtypeStruct((nb, 8, 128), state.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
    )(pad(state), pad(const))
    return out[:, :, :ny, :nx], err[:, 0, 0]

# correctness vs interpret-mode reference from repo
sys.path.insert(0, "/root/repo")
from tpuflow.ops.tvl1_pallas import tvl1_iterate_pallas
rng = np.random.default_rng(0)
B, H, W = 2, 64, 200
state = jnp.asarray(rng.standard_normal((B, 6, H, W)), jnp.float32)
const = jnp.asarray(np.abs(rng.standard_normal((B, 4, H, W))), jnp.float32)
out, err = tvl1_iterate_whole(state, const, 5, 0.045, 0.3, 0.8333)
out.block_until_ready()
ref, referr = tvl1_iterate_pallas(state, const, 5, 0.045, 0.3, 0.8333, interpret=True)
d = float(jnp.max(jnp.abs(out - ref)))
de = float(jnp.max(jnp.abs(err - referr)))
print("EXP_C small OK maxdiff", d, "errdiff", de, flush=True)
assert d < 1e-5 and de < 1e-2

# bench-shape test + timing
B, H, W = 16, 436, 1024
state = jnp.asarray(rng.standard_normal((B, 6, H, W)), jnp.float32)
const = jnp.asarray(np.abs(rng.standard_normal((B, 4, H, W))), jnp.float32)
for ni in (10, 30):
    out, err = tvl1_iterate_whole(state, const, ni, 0.045, 0.3, 0.8333)
    out.block_until_ready()
    t0 = time.perf_counter()
    N = 10
    for _ in range(N):
        out, err = tvl1_iterate_whole(state, const, ni, 0.045, 0.3, 0.8333)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / N
    per_iter = dt / ni / B * 1e6
    print(f"EXP_C bench n_iters={ni}: {dt*1e3:.2f} ms/call, {per_iter:.1f} us/iter/sample", flush=True)
