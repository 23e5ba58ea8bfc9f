#!/usr/bin/env python3
"""Generate golden fixtures from the reference implementation.

Runs tools/build_reference.sh's harness (OMP_NUM_THREADS=1 for
deterministic SOR order) on deterministic synthetic inputs and saves
inputs + outputs as .npz files under tests/goldens/.

Synthetic inputs are smooth band-limited random fields: variational flow
methods assume differentiable image intensity, and smooth fields
exercise every code path (including out-of-domain warps) without the
quantization noise of 8-bit test images.
"""

import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = os.path.join(REPO, "tests", "goldens")
HARNESS = os.environ.get("REF_HARNESS", "/tmp/refbuild/ref_harness")

ENV = dict(os.environ, OMP_NUM_THREADS="1")


def smooth_field(shape, rng, scale=8.0, amp=1.0):
    """Band-limited random field: white noise blurred in Fourier space."""
    noise = rng.standard_normal(shape)
    fy = np.fft.fftfreq(shape[0])[:, None]
    fx = np.fft.fftfreq(shape[1])[None, :]
    filt = np.exp(-(fx**2 + fy**2) * (scale**2) * 20.0)
    out = np.real(np.fft.ifft2(np.fft.fft2(noise) * filt))
    out = out / (np.abs(out).max() + 1e-12)
    return (amp * out).astype(np.float64)


def image_pair(shape, rng, max_disp=3.0):
    """I0 plus I1 = I0 translated by a smooth flow (by Fourier shift of
    a bigger canvas would be cleaner; simple resampling is fine for
    goldens — both sides see the same arrays)."""
    base = 128.0 + 100.0 * smooth_field(shape, rng, scale=6.0)
    u = smooth_field(shape, rng, scale=12.0, amp=max_disp)
    v = smooth_field(shape, rng, scale=12.0, amp=max_disp)
    # sample I1(x) = I0(x + flow) by bilinear interp (numpy)
    h, w = shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    sx = np.clip(xx + u, 0, w - 1)
    sy = np.clip(yy + v, 0, h - 1)
    x0 = np.clip(np.floor(sx).astype(int), 0, w - 2)
    y0 = np.clip(np.floor(sy).astype(int), 0, h - 2)
    fx = sx - x0
    fy = sy - y0
    I1 = (
        base[y0, x0] * (1 - fx) * (1 - fy)
        + base[y0, x0 + 1] * fx * (1 - fy)
        + base[y0 + 1, x0] * (1 - fx) * fy
        + base[y0 + 1, x0 + 1] * fx * fy
    )
    return base, I1, u, v


def run(args):
    subprocess.run([HARNESS] + [str(a) for a in args], check=True, env=ENV,
                   stdout=subprocess.DEVNULL)


class Tmp:
    def __init__(self, d):
        self.d = d
        self.n = 0

    def put(self, arr):
        self.n += 1
        p = os.path.join(self.d, f"a{self.n}.raw")
        np.asarray(arr, dtype="<f8").tofile(p)
        return p

    def out(self):
        self.n += 1
        return os.path.join(self.d, f"a{self.n}.raw")

    def get(self, p, shape):
        return np.fromfile(p, dtype="<f8").reshape(shape)


def main():
    os.makedirs(GOLD, exist_ok=True)
    rng = np.random.default_rng(20260817)
    with tempfile.TemporaryDirectory() as d:
        t = Tmp(d)

        # ---- op goldens on two odd/even sizes
        for tag, (ny, nx) in (("a", (53, 77)), ("b", (64, 96))):
            I = 128.0 + 100.0 * smooth_field((ny, nx), rng, scale=5.0)
            V1 = smooth_field((ny, nx), rng, scale=5.0, amp=2.0)
            V2 = smooth_field((ny, nx), rng, scale=5.0, amp=2.0)
            U = smooth_field((ny, nx), rng, scale=10.0, amp=4.0)
            V = smooth_field((ny, nx), rng, scale=10.0, amp=4.0)

            pi = t.put(I)
            o1, o2 = t.out(), t.out()
            run(["centered_gradient", pi, ny, nx, o1, o2])
            cg_dx, cg_dy = t.get(o1, (ny, nx)), t.get(o2, (ny, nx))
            o1, o2 = t.out(), t.out()
            run(["forward_gradient", pi, ny, nx, o1, o2])
            fg_dx, fg_dy = t.get(o1, (ny, nx)), t.get(o2, (ny, nx))
            o1 = t.out()
            run(["divergence", t.put(V1), t.put(V2), ny, nx, o1])
            div = t.get(o1, (ny, nx))
            d2 = {}
            for op in ("dxx", "dyy", "dxy"):
                o1 = t.out()
                run([op, pi, ny, nx, 1, o1])
                d2[op] = t.get(o1, (ny, nx))
            gau = {}
            for sigma in (0.8, 1.0392304845413263, 3.0):
                for bc in (0, 1):
                    o1 = t.out()
                    run(["gaussian", pi, ny, nx, repr(sigma), bc, o1])
                    gau[f"gaussian_{sigma:.4f}_bc{bc}"] = t.get(o1, (ny, nx))
            warps = {}
            for border in (0, 1):
                o1 = t.out()
                run(["warp", pi, t.put(U), t.put(V), ny, nx, border, o1])
                warps[f"warp_b{border}"] = t.get(o1, (ny, nx))
            # large displacements to stress boundary handling
            o1 = t.out()
            run(["warp", pi, t.put(U * 8), t.put(V * 8), ny, nx, 1, o1])
            warps["warp_big_b1"] = t.get(o1, (ny, nx))
            o1 = t.out()
            p = subprocess.run(
                [HARNESS, "zoom_out", pi, str(ny), str(nx), "0.5", o1],
                check=True, env=ENV, capture_output=True, text=True)
            nxx, nyy = map(int, p.stdout.split())
            zo = t.get(o1, (nyy, nxx))
            o1 = t.out()
            run(["zoom_in", t.put(zo), nyy, nxx, nx, ny, o1])
            zi = t.get(o1, (ny, nx))
            o1 = t.out()
            run(["median", pi, ny, nx, 3, o1])
            med3 = t.get(o1, (ny, nx))
            o1 = t.out()
            run(["median", pi, ny, nx, 5, o1])
            med5 = t.get(o1, (ny, nx))

            np.savez_compressed(
                os.path.join(GOLD, f"ops_{tag}.npz"),
                I=I, V1=V1, V2=V2, U=U, V=V,
                centered_dx=cg_dx, centered_dy=cg_dy,
                forward_dx=fg_dx, forward_dy=fg_dy,
                divergence=div,
                dxx=d2["dxx"], dyy=d2["dyy"], dxy=d2["dxy"],
                zoom_out_05=zo, zoom_in_back=zi,
                median3=med3, median5=med5,
                **gau, **warps,
            )
            print(f"ops_{tag}.npz done")

        # ---- solver goldens
        ny, nx = 64, 96
        I0, I1, tu, tv = image_pair((ny, nx), rng)
        p0, p1 = t.put(I0), t.put(I1)

        o1, o2 = t.out(), t.out()
        run(["hs_classic", p0, p1, ny, nx, 100, 20.0, o1, o2])
        hs_u, hs_v = t.get(o1, (ny, nx)), t.get(o2, (ny, nx))

        o1, o2 = t.out(), t.out()
        run(["normalize2", p0, p1, ny * nx, o1, o2])
        n0, n1 = t.get(o1, (ny, nx)), t.get(o2, (ny, nx))

        # single-scale solvers get pre-normalized, pre-smoothed inputs
        # (the multiscale drivers do that themselves)
        o1, o2 = t.out(), t.out()
        run(["tvl1_scale", t.put(n0), t.put(n1), ny, nx,
             0.25, 0.15, 0.3, 5, 0.01, o1, o2])
        tvl1s_u, tvl1s_v = t.get(o1, (ny, nx)), t.get(o2, (ny, nx))

        o1, o2 = t.out(), t.out()
        run(["tvl1_multi", p0, p1, ny, nx, 0.25, 0.15, 0.3,
             5, 0.5, 5, 0.01, o1, o2])
        tvl1m_u, tvl1m_v = t.get(o1, (ny, nx)), t.get(o2, (ny, nx))

        o1, o2 = t.out(), t.out()
        run(["hs_flow", t.put(n0), t.put(n1), ny, nx, 7.0, 2, 0.0001, 150, o1, o2])
        hsf_u, hsf_v = t.get(o1, (ny, nx)), t.get(o2, (ny, nx))

        o1, o2 = t.out(), t.out()
        run(["hs_pyramidal", p0, p1, ny, nx, 7.0, 3, 0.5, 10, 0.0001, 150, o1, o2])
        hsp_u, hsp_v = t.get(o1, (ny, nx)), t.get(o2, (ny, nx))

        np.savez_compressed(
            os.path.join(GOLD, "solvers.npz"),
            I0=I0, I1=I1, true_u=tu, true_v=tv, n0=n0, n1=n1,
            hs_classic_u=hs_u, hs_classic_v=hs_v,
            tvl1_scale_u=tvl1s_u, tvl1_scale_v=tvl1s_v,
            tvl1_multi_u=tvl1m_u, tvl1_multi_v=tvl1m_v,
            hs_flow_u=hsf_u, hs_flow_v=hsf_v,
            hs_pyramidal_u=hsp_u, hs_pyramidal_v=hsp_v,
        )
        print("solvers.npz done")

        # ---- Brox spatial goldens (same input pair; multiscale entry
        # point covers both single-scale nscales=1 and pyramid runs)
        o1, o2 = t.out(), t.out()
        run(["brox_spatial", p0, p1, ny, nx, 50.0, 10.0, 1, 0.5,
             0.0001, 1, 15, o1, o2])
        bs1_u, bs1_v = t.get(o1, (ny, nx)), t.get(o2, (ny, nx))

        o1, o2 = t.out(), t.out()
        run(["brox_spatial", p0, p1, ny, nx, 50.0, 10.0, 3, 0.5,
             0.0001, 1, 15, o1, o2])
        bs3_u, bs3_v = t.get(o1, (ny, nx)), t.get(o2, (ny, nx))

        np.savez_compressed(
            os.path.join(GOLD, "brox.npz"),
            I0=I0, I1=I1, true_u=tu, true_v=tv,
            spatial_s1_u=bs1_u, spatial_s1_v=bs1_v,
            spatial_s3_u=bs3_u, spatial_s3_v=bs3_v,
        )
        print("brox.npz done")

        # ---- robust_expo goldens: grayscale multiscale x 3 methods,
        # RGB (interleaved) single-scale
        re = {"I0": I0, "I1": I1, "true_u": tu, "true_v": tv}
        for m in (1, 2, 3):
            o1, o2 = t.out(), t.out()
            run(["robust_expo", p0, p1, ny, nx, 1, m, 50.0, 10.0, 0.2,
                 3, 0.5, 0.0001, 1, 15, o1, o2])
            re[f"gray_m{m}_u"] = t.get(o1, (ny, nx))
            re[f"gray_m{m}_v"] = t.get(o2, (ny, nx))

        # RGB pair: base pair plus two channel variants moved by the
        # same flow
        rgb0 = np.stack([I0,
                         128 + 0.7 * (I0 - 128),
                         128 - 0.5 * (I0 - 128)], axis=-1)
        rgb1 = np.stack([I1,
                         128 + 0.7 * (I1 - 128),
                         128 - 0.5 * (I1 - 128)], axis=-1)
        pr0, pr1 = t.put(rgb0), t.put(rgb1)
        o1, o2 = t.out(), t.out()
        run(["robust_expo", pr0, pr1, ny, nx, 3, 1, 50.0, 10.0, 0.2,
             1, 0.5, 0.0001, 1, 15, o1, o2])
        re["rgb0"] = rgb0
        re["rgb1"] = rgb1
        re["rgb_m1_u"] = t.get(o1, (ny, nx))
        re["rgb_m1_v"] = t.get(o2, (ny, nx))

        np.savez_compressed(os.path.join(GOLD, "robust_expo.npz"), **re)
        print("robust_expo.npz done")

        # ---- Brox temporal goldens: 4-frame sequence (3 flow fields)
        nyt, nxt = 48, 64
        frames = 4
        baset = 128.0 + 100.0 * smooth_field((nyt + 12, nxt + 12), rng, scale=6.0)
        ut = smooth_field((nyt, nxt), rng, scale=12.0, amp=1.2)
        vt = smooth_field((nyt, nxt), rng, scale=12.0, amp=1.2)
        # frame f = base window translated by f*(ut, vt) (smooth motion)
        yy, xx = np.mgrid[0:nyt, 0:nxt].astype(np.float64)
        vol = np.empty((frames, nyt, nxt))
        for f in range(frames):
            sx = np.clip(xx + 6 + f * ut, 0, nxt + 10)
            sy = np.clip(yy + 6 + f * vt, 0, nyt + 10)
            x0 = np.clip(np.floor(sx).astype(int), 0, nxt + 10)
            y0 = np.clip(np.floor(sy).astype(int), 0, nyt + 10)
            fx = sx - x0
            fy = sy - y0
            vol[f] = (baset[y0, x0] * (1 - fx) * (1 - fy)
                      + baset[y0, x0 + 1] * fx * (1 - fy)
                      + baset[y0 + 1, x0] * (1 - fx) * fy
                      + baset[y0 + 1, x0 + 1] * fx * fy)
        pv = t.put(vol)
        bt = {"vol": vol, "true_u": ut, "true_v": vt}
        for ns, tag in ((1, "s1"), (2, "s2")):
            o1, o2 = t.out(), t.out()
            run(["brox_temporal", pv, nyt, nxt, frames, 18.0, 7.0, ns,
                 0.75, 0.0001, 1, 15, o1, o2])
            bt[f"{tag}_u"] = t.get(o1, (frames - 1, nyt, nxt))
            bt[f"{tag}_v"] = t.get(o2, (frames - 1, nyt, nxt))
        np.savez_compressed(os.path.join(GOLD, "brox_temporal.npz"), **bt)
        print("brox_temporal.npz done")

        # ---- tvl1occflow goldens: 3-frame triplet around I0
        nyo, nxo = 64, 96
        baseo = 128.0 + 100.0 * smooth_field((nyo + 12, nxo + 12), rng, scale=6.0)
        uo = smooth_field((nyo, nxo), rng, scale=12.0, amp=2.0)
        vo = smooth_field((nyo, nxo), rng, scale=12.0, amp=2.0)
        yy, xx = np.mgrid[0:nyo, 0:nxo].astype(np.float64)
        trip = []
        for k in (-1, 0, 1):  # I_{-1}, I0, I1 under constant motion
            sx = np.clip(xx + 6 + k * uo, 0, nxo + 10)
            sy = np.clip(yy + 6 + k * vo, 0, nyo + 10)
            x0 = np.floor(sx).astype(int)
            y0 = np.floor(sy).astype(int)
            fx = sx - x0
            fy = sy - y0
            trip.append(baseo[y0, x0] * (1 - fx) * (1 - fy)
                        + baseo[y0, x0 + 1] * fx * (1 - fy)
                        + baseo[y0 + 1, x0] * (1 - fx) * fy
                        + baseo[y0 + 1, x0 + 1] * fx * fy)
        om1, o0, o1i = trip
        pm1, p0o, p1o = t.put(om1), t.put(o0), t.put(o1i)
        oc = {"Im1": om1, "I0": o0, "I1": o1i, "true_u": uo, "true_v": vo}

        ou, ov, och = t.out(), t.out(), t.out()
        run(["tvl1occ_scale", pm1, p0o, p1o, p0o, nyo, nxo,
             0.15, 0.01, 0.15, 0.3, 2, 0.01, ou, ov, och])
        oc["s1_u"] = t.get(ou, (nyo, nxo))
        oc["s1_v"] = t.get(ov, (nyo, nxo))
        oc["s1_chi"] = t.get(och, (nyo, nxo))

        ou, ov, och = t.out(), t.out(), t.out()
        run(["tvl1occ_multi", pm1, p0o, p1o, p0o, nyo, nxo,
             0.15, 0.01, 0.15, 0.3, 3, 0.5, 2, 0.01, ou, ov, och])
        oc["m3_u"] = t.get(ou, (nyo, nxo))
        oc["m3_v"] = t.get(ov, (nyo, nxo))
        oc["m3_chi"] = t.get(och, (nyo, nxo))
        np.savez_compressed(os.path.join(GOLD, "tvl1occ.npz"), **oc)
        print("tvl1occ.npz done")

        # ---- tvl1occflow with REAL occlusions: textured square moving
        # right over a textured static background; the trailing band is
        # occluded in I1 (visible in I0, covered in neither direction)
        bg = 128.0 + 80.0 * smooth_field((nyo, nxo), rng, scale=4.0)
        fg = 128.0 + 80.0 * smooth_field((nyo, nxo), rng, scale=3.0)
        d = 5  # square displacement per frame (pixels, x direction)
        y0s, y1s, x0s, x1s = 20, 44, 34, 58  # square in I0

        def frame(shift):
            img = bg.copy()
            img[y0s:y1s, x0s + shift:x1s + shift] = \
                fg[y0s:y1s, x0s:x1s]
            return img

        sIm1, sI0, sI1 = frame(-d), frame(0), frame(d)
        ou, ov, och = t.out(), t.out(), t.out()
        run(["tvl1occ_multi", t.put(sIm1), t.put(sI0), t.put(sI1),
             t.put(sI0), nyo, nxo, 0.15, 0.01, 0.15, 0.3, 3, 0.5, 2,
             0.01, ou, ov, och])
        np.savez_compressed(
            os.path.join(GOLD, "tvl1occ_square.npz"),
            Im1=sIm1, I0=sI0, I1=sI1, disp=d,
            square=np.array([y0s, y1s, x0s, x1s]),
            u=t.get(ou, (nyo, nxo)), v=t.get(ov, (nyo, nxo)),
            chi=t.get(och, (nyo, nxo)))
        print("tvl1occ_square.npz done")


if __name__ == "__main__":
    sys.exit(main())
