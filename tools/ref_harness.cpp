// Golden-output harness: links against the reference library (libof.a,
// built from /root/reference/src by tools/build_reference.sh) and dumps
// raw float64 outputs of individual operators/solvers so the JAX
// implementation can be unit-tested against exact oracles.
//
// Usage (all arrays are raw little-endian float64, row-major, ny*nx):
//   ref_harness centered_gradient in ny nx out_dx out_dy
//   ref_harness forward_gradient  in ny nx out_fx out_fy
//   ref_harness divergence        v1 v2 ny nx out
//   ref_harness dxx|dyy|dxy       in ny nx nz out
//   ref_harness gaussian          in ny nx sigma bc out
//   ref_harness warp              in u v ny nx border_out out
//   ref_harness zoom_out          in ny nx factor out        (out is nyy*nxx)
//   ref_harness zoom_in           in ny nx nxx nyy out
//   ref_harness median            in ny nx wsize out
//   ref_harness normalize2        i0 i1 n out0 out1
//   ref_harness hs_classic        i0 i1 ny nx niter alpha out_u out_v
//   ref_harness hs_flow           i0 i1 ny nx alpha warps tol maxiter out_u out_v
//   ref_harness hs_pyramidal      i0 i1 ny nx alpha nscales zfactor warps tol maxiter out_u out_v
//   ref_harness tvl1_scale        i0 i1 ny nx tau lambda theta warps epsilon out_u out_v
//   ref_harness tvl1_multi        i0 i1 ny nx tau lambda theta nscales zfactor warps epsilon out_u out_v
//
// Run with OMP_NUM_THREADS=1: the reference's OpenMP SOR sweeps are
// order-dependent, so single-threaded runs are the deterministic oracle.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "of.h"
#include "operators.h"
#include "bicubic_interpolation.h"
#include "zoom.h"
#include "utils.h"
#include "horn_schunck.h"
#include "tvl1flow.h"
#include "brox_optic_flow.h"
#include "robust_expo_methods.h"
#include "tvl1occflow.h"
#include "tvl1occflow_tv_rof_box.h"
#include "tvl1occflow_solvers.h"
#include "tvl1occflow_constants.h"

static std::vector<double> load(const char *path, size_t n) {
    std::vector<double> v(n);
    FILE *f = fopen(path, "rb");
    if (!f || fread(v.data(), sizeof(double), n, f) != n) {
        fprintf(stderr, "failed to read %zu doubles from %s\n", n, path);
        exit(1);
    }
    fclose(f);
    return v;
}

static void save(const char *path, const double *v, size_t n) {
    FILE *f = fopen(path, "wb");
    if (!f || fwrite(v, sizeof(double), n, f) != n) {
        fprintf(stderr, "failed to write %s\n", path);
        exit(1);
    }
    fclose(f);
}

int main(int argc, char **argv) {
    if (argc < 2) { fprintf(stderr, "usage: ref_harness <op> ...\n"); return 1; }
    std::string op = argv[1];

    if (op == "centered_gradient" || op == "forward_gradient") {
        int ny = atoi(argv[3]), nx = atoi(argv[4]);
        size_t n = (size_t)nx * ny;
        auto in = load(argv[2], n);
        std::vector<double> dx(n), dy(n);
        if (op == "centered_gradient")
            centered_gradient(in.data(), dx.data(), dy.data(), nx, ny, 1);
        else
            forward_gradient(in.data(), dx.data(), dy.data(), nx, ny);
        save(argv[5], dx.data(), n);
        save(argv[6], dy.data(), n);
    } else if (op == "divergence") {
        int ny = atoi(argv[4]), nx = atoi(argv[5]);
        size_t n = (size_t)nx * ny;
        auto v1 = load(argv[2], n), v2 = load(argv[3], n);
        std::vector<double> out(n);
        divergence(v1.data(), v2.data(), out.data(), nx, ny);
        save(argv[6], out.data(), n);
    } else if (op == "dxx" || op == "dyy" || op == "dxy") {
        int ny = atoi(argv[3]), nx = atoi(argv[4]), nz = atoi(argv[5]);
        size_t n = (size_t)nx * ny * nz;
        auto in = load(argv[2], n);
        std::vector<double> out(n);
        if (op == "dxx") Dxx(in.data(), out.data(), nx, ny, nz);
        else if (op == "dyy") Dyy(in.data(), out.data(), nx, ny, nz);
        else Dxy(in.data(), out.data(), nx, ny, nz);
        save(argv[6], out.data(), n);
    } else if (op == "gaussian") {
        int ny = atoi(argv[3]), nx = atoi(argv[4]);
        double sigma = atof(argv[5]);
        int bc = atoi(argv[6]);
        size_t n = (size_t)nx * ny;
        auto in = load(argv[2], n);
        gaussian(in.data(), nx, ny, sigma, bc);
        save(argv[7], in.data(), n);
    } else if (op == "warp") {
        int ny = atoi(argv[5]), nx = atoi(argv[6]);
        int border_out = atoi(argv[7]);
        size_t n = (size_t)nx * ny;
        auto in = load(argv[2], n), u = load(argv[3], n), v = load(argv[4], n);
        std::vector<double> out(n);
        bicubic_interpolation_warp(in.data(), u.data(), v.data(), out.data(),
                                   nx, ny, border_out != 0);
        save(argv[8], out.data(), n);
    } else if (op == "zoom_out") {
        int ny = atoi(argv[3]), nx = atoi(argv[4]);
        double factor = atof(argv[5]);
        size_t n = (size_t)nx * ny;
        auto in = load(argv[2], n);
        int nxx, nyy;
        zoom_size(nx, ny, &nxx, &nyy, factor);
        std::vector<double> out((size_t)nxx * nyy);
        zoom_out(in.data(), out.data(), nx, ny, factor);
        save(argv[6], out.data(), out.size());
        printf("%d %d\n", nxx, nyy);
    } else if (op == "zoom_in") {
        int ny = atoi(argv[3]), nx = atoi(argv[4]);
        int nxx = atoi(argv[5]), nyy = atoi(argv[6]);
        auto in = load(argv[2], (size_t)nx * ny);
        std::vector<double> out((size_t)nxx * nyy);
        zoom_in(in.data(), out.data(), nx, ny, nxx, nyy);
        save(argv[7], out.data(), out.size());
    } else if (op == "median") {
        int ny = atoi(argv[3]), nx = atoi(argv[4]), wsize = atoi(argv[5]);
        size_t n = (size_t)nx * ny;
        auto in = load(argv[2], n);
        me_median_filtering(in.data(), nx, ny, wsize);
        save(argv[6], in.data(), n);
    } else if (op == "normalize2") {
        size_t n = (size_t)atol(argv[4]);
        auto i0 = load(argv[2], n), i1 = load(argv[3], n);
        std::vector<double> o0(n), o1(n);
        image_normalization_2(i0.data(), i1.data(), o0.data(), o1.data(), (int)n);
        save(argv[5], o0.data(), n);
        save(argv[6], o1.data(), n);
    } else if (op == "hs_classic") {
        int ny = atoi(argv[4]), nx = atoi(argv[5]);
        int niter = atoi(argv[6]);
        double alpha = atof(argv[7]);
        size_t n = (size_t)nx * ny;
        auto i0 = load(argv[2], n), i1 = load(argv[3], n);
        std::vector<double> u(n), v(n);
        hs(u.data(), v.data(), i0.data(), i1.data(), nx, ny, niter, alpha);
        save(argv[8], u.data(), n);
        save(argv[9], v.data(), n);
    } else if (op == "hs_flow") {
        int ny = atoi(argv[4]), nx = atoi(argv[5]);
        double alpha = atof(argv[6]);
        int warps = atoi(argv[7]);
        double tol = atof(argv[8]);
        int maxiter = atoi(argv[9]);
        size_t n = (size_t)nx * ny;
        auto i0 = load(argv[2], n), i1 = load(argv[3], n);
        std::vector<double> u(n, 0.0), v(n, 0.0);
        horn_schunck_optical_flow(i0.data(), i1.data(), u.data(), v.data(),
                                  nx, ny, alpha, warps, tol, maxiter, false);
        save(argv[10], u.data(), n);
        save(argv[11], v.data(), n);
    } else if (op == "hs_pyramidal") {
        int ny = atoi(argv[4]), nx = atoi(argv[5]);
        double alpha = atof(argv[6]);
        int nscales = atoi(argv[7]);
        double zfactor = atof(argv[8]);
        int warps = atoi(argv[9]);
        double tol = atof(argv[10]);
        int maxiter = atoi(argv[11]);
        size_t n = (size_t)nx * ny;
        auto i0 = load(argv[2], n), i1 = load(argv[3], n);
        std::vector<double> u(n, 0.0), v(n, 0.0);
        horn_schunck_pyramidal(i0.data(), i1.data(), u.data(), v.data(),
                               nx, ny, alpha, nscales, zfactor, warps,
                               tol, maxiter, false);
        save(argv[12], u.data(), n);
        save(argv[13], v.data(), n);
    } else if (op == "tvl1_scale") {
        int ny = atoi(argv[4]), nx = atoi(argv[5]);
        double tau = atof(argv[6]), lambda = atof(argv[7]), theta = atof(argv[8]);
        int warps = atoi(argv[9]);
        double epsilon = atof(argv[10]);
        size_t n = (size_t)nx * ny;
        auto i0 = load(argv[2], n), i1 = load(argv[3], n);
        std::vector<double> u(n, 0.0), v(n, 0.0);
        Dual_TVL1_optic_flow(i0.data(), i1.data(), u.data(), v.data(), nx, ny,
                             tau, lambda, theta, warps, epsilon, false);
        save(argv[11], u.data(), n);
        save(argv[12], v.data(), n);
    } else if (op == "tvl1_multi") {
        int ny = atoi(argv[4]), nx = atoi(argv[5]);
        double tau = atof(argv[6]), lambda = atof(argv[7]), theta = atof(argv[8]);
        int nscales = atoi(argv[9]);
        double zfactor = atof(argv[10]);
        int warps = atoi(argv[11]);
        double epsilon = atof(argv[12]);
        size_t n = (size_t)nx * ny;
        auto i0 = load(argv[2], n), i1 = load(argv[3], n);
        std::vector<double> u(n, 0.0), v(n, 0.0);
        Dual_TVL1_optic_flow_multiscale(i0.data(), i1.data(), u.data(), v.data(),
                                        nx, ny, tau, lambda, theta, nscales,
                                        zfactor, warps, epsilon, false);
        save(argv[13], u.data(), n);
        save(argv[14], v.data(), n);
    } else if (op == "brox_spatial") {
        // brox_spatial i0 i1 ny nx alpha gamma nscales zfactor tol inner outer out_u out_v
        int ny = atoi(argv[4]), nx = atoi(argv[5]);
        double alpha = atof(argv[6]), gamma = atof(argv[7]);
        int nscales = atoi(argv[8]);
        double zfactor = atof(argv[9]), tol = atof(argv[10]);
        int inner = atoi(argv[11]), outer = atoi(argv[12]);
        size_t n = (size_t)nx * ny;
        auto i0 = load(argv[2], n), i1 = load(argv[3], n);
        std::vector<double> u(n, 0.0), v(n, 0.0);
        brox_optic_flow_spatial(i0.data(), i1.data(), u.data(), v.data(),
                                nx, ny, alpha, gamma, nscales, zfactor,
                                tol, inner, outer, false);
        save(argv[13], u.data(), n);
        save(argv[14], v.data(), n);
    } else if (op == "brox_temporal") {
        // brox_temporal ivol ny nx frames alpha gamma nscales zfactor tol inner outer out_u out_v
        int ny = atoi(argv[3]), nx = atoi(argv[4]), frames = atoi(argv[5]);
        double alpha = atof(argv[6]), gamma = atof(argv[7]);
        int nscales = atoi(argv[8]);
        double zfactor = atof(argv[9]), tol = atof(argv[10]);
        int inner = atoi(argv[11]), outer = atoi(argv[12]);
        size_t n = (size_t)nx * ny * frames;
        size_t n1 = (size_t)nx * ny * (frames - 1);
        auto ivol = load(argv[2], n);
        std::vector<double> u(n1, 0.0), v(n1, 0.0);
        brox_optic_flow_temporal(ivol.data(), u.data(), v.data(),
                                 nx, ny, frames, alpha, gamma, nscales,
                                 zfactor, tol, inner, outer, false);
        save(argv[13], u.data(), n1);
        save(argv[14], v.data(), n1);
    } else if (op == "robust_expo") {
        // robust_expo i0 i1 ny nx nz method alpha gamma lambda nscales zfactor tol inner outer out_u out_v
        int ny = atoi(argv[4]), nx = atoi(argv[5]), nz = atoi(argv[6]);
        int method = atoi(argv[7]);
        double alpha = atof(argv[8]), gamma = atof(argv[9]), lambda = atof(argv[10]);
        int nscales = atoi(argv[11]);
        double zfactor = atof(argv[12]), tol = atof(argv[13]);
        int inner = atoi(argv[14]), outer = atoi(argv[15]);
        size_t n = (size_t)nx * ny * nz;
        auto i0 = load(argv[2], n), i1 = load(argv[3], n);
        std::vector<double> u((size_t)nx * ny, 0.0), v((size_t)nx * ny, 0.0);
        robust_expo_methods(i0.data(), i1.data(), u.data(), v.data(),
                            nx, ny, nz, method, alpha, gamma, lambda,
                            nscales, zfactor, tol, inner, outer, false);
        save(argv[16], u.data(), u.size());
        save(argv[17], v.data(), v.size());
    } else if (op == "tvl1occ_scale" || op == "tvl1occ_multi") {
        // tvl1occ_scale im1 i0 i1 filt ny nx lambda alpha beta theta warps epsilon out_u out_v out_chi
        // tvl1occ_multi im1 i0 i1 filt ny nx lambda alpha beta theta nscales zfactor warps epsilon out_u out_v out_chi
        int ny = atoi(argv[6]), nx = atoi(argv[7]);
        double lambda = atof(argv[8]), alpha = atof(argv[9]);
        double beta = atof(argv[10]), theta = atof(argv[11]);
        size_t n = (size_t)nx * ny;
        auto im1 = load(argv[2], n), i0 = load(argv[3], n);
        auto i1 = load(argv[4], n), filt = load(argv[5], n);
        std::vector<double> u(n, 0.0), v(n, 0.0), chi(n, 0.0);
        if (op == "tvl1occ_scale") {
            int warps = atoi(argv[12]);
            double epsilon = atof(argv[13]);
            Dual_TVL1_optic_flow(im1.data(), i0.data(), i1.data(), filt.data(),
                                 u.data(), v.data(), chi.data(), nx, ny,
                                 lambda, alpha, beta, theta, warps, epsilon,
                                 false);
            save(argv[14], u.data(), n);
            save(argv[15], v.data(), n);
            save(argv[16], chi.data(), n);
        } else {
            int nscales = atoi(argv[12]);
            double zfactor = atof(argv[13]);
            int warps = atoi(argv[14]);
            double epsilon = atof(argv[15]);
            Dual_TVL1_optic_flow_multiscale(im1.data(), i0.data(), i1.data(),
                                            filt.data(), u.data(), v.data(),
                                            chi.data(), nx, ny, lambda, alpha,
                                            beta, theta, nscales, zfactor,
                                            warps, epsilon, false);
            save(argv[16], u.data(), n);
            save(argv[17], v.data(), n);
            save(argv[18], chi.data(), n);
        }
    } else if (op == "rof_box") {
        // rof_box u f p1 p2 g ny nx lambda omega niter out_u out_p1 out_p2
        int ny = atoi(argv[7]), nx = atoi(argv[8]);
        double lambda = atof(argv[9]), omega = atof(argv[10]);
        int niter = atoi(argv[11]);
        size_t n = (size_t)nx * ny;
        auto u = load(argv[2], n), f = load(argv[3], n);
        auto p1 = load(argv[4], n), p2 = load(argv[5], n);
        auto g = load(argv[6], n);
        Scalar_ROF_BoxCellCentered(u.data(), f.data(), p1.data(), p2.data(),
                                   g.data(), lambda, omega, nx, ny, niter);
        save(argv[12], u.data(), n);
        save(argv[13], p1.data(), n);
        save(argv[14], p2.data(), n);
    } else if (op == "occ_v") {
        // occ_v u1 u2 chi I1wx I1wy Im1wx Im1wy rho1c rho3c grad1 grad3
        //       ny nx alpha theta lambda out_v1 out_v2 out_v11 out_v12 out_v31 out_v32
        int ny = atoi(argv[13]), nx = atoi(argv[14]);
        double alpha = atof(argv[15]), theta = atof(argv[16]), lambda = atof(argv[17]);
        size_t n = (size_t)nx * ny;
        auto u1 = load(argv[2], n), u2 = load(argv[3], n), chi = load(argv[4], n);
        auto a1 = load(argv[5], n), a2 = load(argv[6], n);
        auto b1 = load(argv[7], n), b2 = load(argv[8], n);
        auto r1 = load(argv[9], n), r3 = load(argv[10], n);
        auto g1 = load(argv[11], n), g3 = load(argv[12], n);
        std::vector<double> v1(n), v2(n), v11(n), v12(n), v31(n), v32(n);
        Solver_wrt_v(u1.data(), u2.data(), v1.data(), v2.data(), chi.data(),
                     a1.data(), a2.data(), b1.data(), b2.data(),
                     r1.data(), r3.data(), v11.data(), v12.data(),
                     v31.data(), v32.data(), g1.data(), g3.data(),
                     alpha, theta, lambda, nx, ny);
        save(argv[18], v1.data(), n);
        save(argv[19], v2.data(), n);
        save(argv[20], v11.data(), n);
        save(argv[21], v12.data(), n);
        save(argv[22], v31.data(), n);
        save(argv[23], v32.data(), n);
    } else if (op == "occ_u") {
        // occ_u v1 v2 chi g ny nx theta beta niter out_u1 out_u2
        // calls Solver_wrt_u `niter` times in sequence (dual state is
        // function-static in the reference)
        int ny = atoi(argv[6]), nx = atoi(argv[7]);
        double theta = atof(argv[8]), beta = atof(argv[9]);
        int niter = atoi(argv[10]);
        size_t n = (size_t)nx * ny;
        auto v1 = load(argv[2], n), v2 = load(argv[3], n);
        auto chi = load(argv[4], n), g = load(argv[5], n);
        std::vector<double> u1(n), u2(n);
        for (int it = 0; it < niter; it++)
            Solver_wrt_u(u1.data(), u2.data(), v1.data(), v2.data(),
                         chi.data(), g.data(), theta, beta, nx, ny);
        save(argv[11], u1.data(), n);
        save(argv[12], u2.data(), n);
    } else if (op == "occ_chi") {
        // occ_chi u1 u2 chi I1wx I1wy Im1wx Im1wy rho1c rho3c
        //         v11 v12 v31 v32 g ny nx lambda theta alpha beta out_chi
        int ny = atoi(argv[16]), nx = atoi(argv[17]);
        double lambda = atof(argv[18]), theta = atof(argv[19]);
        double alpha = atof(argv[20]), beta = atof(argv[21]);
        size_t n = (size_t)nx * ny;
        auto u1 = load(argv[2], n), u2 = load(argv[3], n), chi = load(argv[4], n);
        auto a1 = load(argv[5], n), a2 = load(argv[6], n);
        auto b1 = load(argv[7], n), b2 = load(argv[8], n);
        auto r1 = load(argv[9], n), r3 = load(argv[10], n);
        auto v11 = load(argv[11], n), v12 = load(argv[12], n);
        auto v31 = load(argv[13], n), v32 = load(argv[14], n);
        auto g = load(argv[15], n);
        Solver_wrt_chi(u1.data(), u2.data(), chi.data(), a1.data(), a2.data(),
                       b1.data(), b2.data(), r1.data(), r3.data(),
                       v11.data(), v12.data(), v31.data(), v32.data(),
                       g.data(), lambda, theta, alpha, beta,
                       TAU_CHI, TAU_ETA, nx, ny);
        save(argv[22], chi.data(), n);
    } else {
        fprintf(stderr, "unknown op %s\n", op.c_str());
        return 1;
    }
    return 0;
}
