# Variant D: production candidates.
#  d1: tvl1 whole-image kernel with in-kernel fori_loop (compile-time fix)
#  d2: same + approx reciprocal for the dual normalizers
#  d3: HS whole-image 4-color SOR kernel with separable laplacian
# Each timed at the bench shape (B=16, 436x1024).
import sys, functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/tmp/tpuflow-jax-cache")
sys.path.insert(0, "/root/repo")

GRAD_IS_ZERO = 1e-10

def make_tvl1(approx):
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
        if approx:
            fi = -pl.reciprocal(jnp.maximum(grad, GRAD_IS_ZERO), approx=True)
        else:
            fi = -1.0 / jnp.maximum(grad, GRAD_IS_ZERO)

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

        def one_iter(c):
            u1, u2, p11, p12, p21, p22, _, _ = c
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
            s1 = 1.0 + taut * jnp.sqrt(u1x * u1x + u1y * u1y)
            s2 = 1.0 + taut * jnp.sqrt(u2x * u2x + u2y * u2y)
            if approx:
                ng1 = pl.reciprocal(s1, approx=True)
                ng2 = pl.reciprocal(s2, approx=True)
            else:
                ng1 = 1.0 / s1
                ng2 = 1.0 / s2
            p11 = (p11 + taut * u1x) * ng1
            p12 = (p12 + taut * u1y) * ng1
            p21 = (p21 + taut * u2x) * ng2
            p22 = (p22 + taut * u2y) * ng2
            return u1, u2, p11, p12, p21, p22, u1p, u2p

        init = (state_ref[0, 0], state_ref[0, 1], state_ref[0, 2],
                state_ref[0, 3], state_ref[0, 4], state_ref[0, 5],
                state_ref[0, 0], state_ref[0, 1])
        c = jax.lax.fori_loop(0, n_iters, lambda i, c: one_iter(c), init)
        u1, u2, p11, p12, p21, p22, u1p, u2p = c
        out_ref[0, 0] = u1; out_ref[0, 1] = u2
        out_ref[0, 2] = p11; out_ref[0, 3] = p12
        out_ref[0, 4] = p21; out_ref[0, 5] = p22
        du = jnp.where(in_img, u1 - u1p, zero)
        dv = jnp.where(in_img, u2 - u2p, zero)
        err_ref[0] = jnp.full((8, 128), jnp.sum(du * du + dv * dv), dtype)

    @functools.partial(jax.jit, static_argnames=("n_iters", "l_t", "theta", "taut"))
    def run(state, const, n_iters, l_t, theta, taut):
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
    return run

def hs_kern(state_ref, const_ref, out_ref, err_ref, *, n_sweeps, ny, nx, alpha2):
    dtype = out_ref.dtype
    Hp, Wp = state_ref.shape[2], state_ref.shape[3]
    w = 1.9
    gi = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 0)
    gj = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 1)
    in_img = (gi < ny) & (gj < nx)
    zero = jnp.zeros((), dtype)
    colors = [((gi % 2 == r) & (gj % 2 == c)) for r in (0, 1) for c in (0, 1)]

    au = const_ref[0, 0]; av = const_ref[0, 1]
    rdu = 1.0 / const_ref[0, 2]; rdv = 1.0 / const_ref[0, 3]
    dd = const_ref[0, 4]

    # Neumann-clamped shifts on the full image: the out-of-image neighbor
    # folds back to the border pixel
    def sh_l(a):  # j-1
        s = jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)
        return jnp.where(gj == 0, a, s)
    def sh_r(a):  # j+1
        s = jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
        return jnp.where(gj >= nx - 1, a, s)
    def sh_u(a):  # i-1
        s = jnp.concatenate([a[:1], a[:-1]], axis=0)
        return jnp.where(gi == 0, a, s)
    def sh_d(a):  # i+1
        s = jnp.concatenate([a[1:], a[-1:]], axis=0)
        return jnp.where(gi >= ny - 1, a, s)

    def laplacian(f):
        h = sh_l(f) + sh_r(f)
        v = sh_u(f) + sh_d(f)
        diag = sh_u(h) + sh_d(h)
        return diag / 12.0 + (h + v) / 6.0

    def one_sweep(c):
        u, v, _, _ = c
        up, vp = u, v
        for mask in colors:
            ula = laplacian(u)
            u_c = (1.0 - w) * u + w * (au - dd * v + alpha2 * ula) * rdu
            u = jnp.where(mask, u_c, u)
            vla = laplacian(v)
            v_c = (1.0 - w) * v + w * (av - dd * u + alpha2 * vla) * rdv
            v = jnp.where(mask, v_c, v)
        return u, v, up, vp

    init = (state_ref[0, 0], state_ref[0, 1], state_ref[0, 0], state_ref[0, 1])
    u, v, up, vp = jax.lax.fori_loop(0, n_sweeps, lambda i, c: one_sweep(c), init)
    out_ref[0, 0] = u; out_ref[0, 1] = v
    du = jnp.where(in_img, u - up, zero)
    dv = jnp.where(in_img, v - vp, zero)
    err_ref[0] = jnp.full((8, 128), jnp.sum(du * du + dv * dv), dtype)

@functools.partial(jax.jit, static_argnames=("n_sweeps", "alpha2"))
def hs_run(state, const, n_sweeps, alpha2):
    nb, _, ny, nx = state.shape
    ru = lambda x, m: -(-x // m) * m
    Hp, Wp = ru(ny, 8), ru(nx, 128)
    pad = lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, Hp - ny), (0, Wp - nx)))
    k = functools.partial(hs_kern, n_sweeps=n_sweeps, ny=ny, nx=nx, alpha2=float(alpha2))
    out, err = pl.pallas_call(
        k, grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 2, Hp, Wp), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5, Hp, Wp), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 2, Hp, Wp), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, 2, Hp, Wp), state.dtype),
            jax.ShapeDtypeStruct((nb, 8, 128), state.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
    )(pad(state), pad(const))
    return out[:, :, :ny, :nx], err[:, 0, 0]

rng = np.random.default_rng(0)

# ---- correctness of d1 vs repo interpret-mode oracle (small) ----
from tpuflow.ops.tvl1_pallas import tvl1_iterate_pallas
B, H, W = 2, 64, 200
state = jnp.asarray(rng.standard_normal((B, 6, H, W)), jnp.float32)
const = jnp.asarray(np.abs(rng.standard_normal((B, 4, H, W))), jnp.float32)
d1 = make_tvl1(False)
out, err = d1(state, const, 5, 0.045, 0.3, 0.8333)
ref, referr = tvl1_iterate_pallas(state, const, 5, 0.045, 0.3, 0.8333, interpret=True)
print("D1 small maxdiff", float(jnp.max(jnp.abs(out - ref))),
      "errdiff", float(jnp.max(jnp.abs(err - referr))), flush=True)

d2 = make_tvl1(True)
out2, err2 = d2(state, const, 5, 0.045, 0.3, 0.8333)
print("D2(approx) vs D1 maxdiff", float(jnp.max(jnp.abs(out2 - out))), flush=True)

# ---- HS correctness vs repo 4-color sweep oracle ----
from tpuflow.models.hs_pyramidal import _four_colors, _sor_sweep
B, H, W = 2, 48, 200
u = jnp.asarray(rng.standard_normal((B, H, W)) * .5, jnp.float32)
v = jnp.asarray(rng.standard_normal((B, H, W)) * .5, jnp.float32)
Au = jnp.asarray(rng.standard_normal((B, H, W)) * 10, jnp.float32)
Av = jnp.asarray(rng.standard_normal((B, H, W)) * 10, jnp.float32)
Du = jnp.asarray(np.abs(rng.standard_normal((B, H, W))) * 50 + 49, jnp.float32)
Dv = jnp.asarray(np.abs(rng.standard_normal((B, H, W))) * 50 + 49, jnp.float32)
D = jnp.asarray(rng.standard_normal((B, H, W)) * 5, jnp.float32)
st = jnp.stack([u, v], axis=1); cn = jnp.stack([Au, Av, Du, Dv, D], axis=1)
hout, herr = hs_run(st, cn, 3, 49.0)
colors = _four_colors((H, W))
uu, vv = u, v
for s in range(3):
    if s == 2: upp, vpp = uu, vv
    uu, vv, _ = jax.vmap(lambda a,b: _sor_sweep(a, b, Au[0]*0+Au, Av, Du, Dv, D, 49.0, colors))(uu[None][0][None]*0+uu, vv) if False else (None, None, None)
# simpler: loop per sample
ok = True
for bidx in range(B):
    uu, vv = u[bidx], v[bidx]
    for s in range(3):
        if s == 2: upp, vpp = uu, vv
        uu, vv, _ = _sor_sweep(uu, vv, Au[bidx], Av[bidx], Du[bidx], Dv[bidx], D[bidx], 49.0, colors)
    d = float(jnp.max(jnp.abs(hout[bidx, 0] - uu))) + float(jnp.max(jnp.abs(hout[bidx, 1] - vv)))
    re = float(jnp.abs(herr[bidx] - jnp.sum((uu - upp) ** 2 + (vv - vpp) ** 2)))
    print(f"D3 HS sample {bidx} maxdiff {d:.3e} errdiff {re:.3e}", flush=True)
    ok = ok and d < 1e-4

# ---- bench-shape timing ----
B, H, W = 16, 436, 1024
state = jnp.asarray(rng.standard_normal((B, 6, H, W)), jnp.float32)
const = jnp.asarray(np.abs(rng.standard_normal((B, 4, H, W))), jnp.float32)
for name, fn in (("D1", d1), ("D2approx", d2)):
    for ni in (10, 30):
        out, err = fn(state, const, ni, 0.045, 0.3, 0.8333)
        out.block_until_ready()
        t0 = time.perf_counter(); N = 10
        for _ in range(N):
            out, err = fn(state, const, ni, 0.045, 0.3, 0.8333)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / N
        print(f"{name} n_iters={ni}: {dt*1e3:.2f} ms/call, {dt/ni/B*1e6:.1f} us/iter/sample", flush=True)

st = jnp.asarray(rng.standard_normal((B, 2, H, W)), jnp.float32)
cn = jnp.asarray(np.abs(rng.standard_normal((B, 5, H, W))) + 49, jnp.float32)
for ns in (4, 12):
    out, err = hs_run(st, cn, ns, 49.0)
    out.block_until_ready()
    t0 = time.perf_counter(); N = 10
    for _ in range(N):
        out, err = hs_run(st, cn, ns, 49.0)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / N
    print(f"D3 HS n_sweeps={ns}: {dt*1e3:.2f} ms/call, {dt/ns/B*1e6:.1f} us/sweep/sample", flush=True)

# ---- warp kernel timing at bench shape ----
from tpuflow.ops.warp_pallas import warp_planes_pallas_batched
planes = jnp.asarray(rng.standard_normal((B, 3, H, W)), jnp.float32)
u1 = jnp.asarray(rng.standard_normal((B, H, W)), jnp.float32)
u2 = jnp.asarray(rng.standard_normal((B, H, W)), jnp.float32)
wout = warp_planes_pallas_batched(planes, u1, u2, 3)
wout.block_until_ready()
t0 = time.perf_counter(); N = 10
for _ in range(N):
    wout = warp_planes_pallas_batched(planes, u1, u2, 3)
wout.block_until_ready()
dt = (time.perf_counter() - t0) / N
print(f"WARP dmax=3: {dt*1e3:.2f} ms/call, {dt/B*1e6:.1f} us/sample", flush=True)
