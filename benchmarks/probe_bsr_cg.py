"""TPU probe: CG iteration counts + per-matvec cost, sorted vs BSR.

Diagnoses why the BSR transductive solve converges differently from the
segment-sum one despite applying the same (permuted) matrix.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    d, l, k_lab = 128, 10, 250
    blk = 256

    from graphlearninglayer_tpu.ops.bsr import (bsr_plan, bsr_spmm,
                                                bsr_stats, build_bsr_mat)
    from graphlearninglayer_tpu.ops.graph import edge_weights, sym_rowsum
    from graphlearninglayer_tpu.ops.solve import stable_conjgrad
    from graphlearninglayer_tpu.ops.transductive import _build

    rng = np.random.default_rng(0)
    centers = rng.normal(size=(l, d)).astype(np.float32) * 2.0
    lab = rng.integers(0, l, n)
    x = centers[lab] + rng.normal(size=(n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    salt = np.random.default_rng(time.time_ns())
    x += 1e-4 * salt.normal(size=x.shape).astype(np.float32)
    y = np.zeros((k_lab, l), np.float32)
    y[np.arange(k_lab), lab[:k_lab]] = 1.0
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    g = _build(xj, k, "auto", 2048)
    plan = bsr_plan(xj, g, k_lab, max(8, min(512, n // 1024)), blk)
    hist = np.asarray(jax.device_get(bsr_stats(plan, blk)), np.int64)
    cum = np.cumsum(hist)
    smax = -(-int(np.searchsorted(cum, 0.99 * cum[-1]) + 1) // 8) * 8
    ovf = int(cum[-1] - cum[smax - 1])
    ovf_cap = 0 if ovf == 0 else -(-ovf // 4096) * 4096
    wp, _ = edge_weights(plan.gp)
    mat = jax.jit(build_bsr_mat, static_argnums=(2, 3, 4))(
        plan, wp, blk, smax, ovf_cap)

    tau = 1e-8

    @jax.jit
    def cg_sorted(g, y):
        w, _ = edge_weights(g)
        nn, kk = g.nbr.shape
        coefw = g.coef * w
        dst = g.nbr.reshape(-1)
        order = jnp.argsort(dst)
        dst_s = dst[order]
        src_s = jnp.repeat(jnp.arange(nn, dtype=jnp.int32), kk)[order]
        c_s = coefw.reshape(-1)[order]

        def matvec(p):
            out = jnp.einsum("nk,nkl->nl", coefw, p[g.nbr])
            contrib = c_s[:, None] * p[src_s]
            return out + jax.ops.segment_sum(contrib, dst_s, num_segments=nn,
                                             indices_are_sorted=True)

        return _cg(matvec, sym_rowsum(g, w), y)

    @jax.jit
    def cg_bsr(mat, gp, perm, y):
        w, _ = edge_weights(gp)
        return _cg(lambda p: bsr_spmm(mat, p, gp.n), sym_rowsum(gp, w),
                   y[perm[:k_lab]])

    def _cg(matvec, deg, y):
        m = deg.shape[0] - k_lab
        y_full = jnp.concatenate([y, jnp.zeros((m, l), y.dtype)], axis=0)
        rhs = matvec(y_full)[k_lab:]
        diag = deg[k_lab:] + jnp.asarray(tau, deg.dtype)
        mscale = 1.0 / jnp.sqrt(diag + 1e-10)

        def mv(p):
            p = mscale[:, None] * p
            p_full = jnp.pad(p, ((k_lab, 0), (0, 0)))
            wpv = matvec(p_full)[k_lab:]
            return mscale[:, None] * (diag[:, None] * p - wpv)

        z, iters, err = stable_conjgrad(mv, mscale[:, None] * rhs,
                                        return_info=True)
        return mscale[:, None] * z, iters, err

    for name, fn, args in [("sorted", cg_sorted, (g, yj)),
                           ("bsr", cg_bsr, (mat, plan.gp, plan.perm, yj))]:
        t0 = time.perf_counter()
        out, iters, err = fn(*args)
        out_h = np.asarray(out)
        t1 = time.perf_counter()
        print(f"cg[{name:6s}] iters={int(iters):5d} final_err={float(err):.3e}"
              f"  (warm+compile {t1-t0:.1f}s)  out[0,:3]={out_h[0, :3]}",
              flush=True)
        if name == "sorted":
            ref = out_h
        else:
            # un-permute bsr solution to original order for comparison
            inv = np.asarray(plan.inv)
            got = out_h[inv[k_lab:] - k_lab]
            diff = np.abs(got - ref).max()
            print(f"max |bsr - sorted| = {diff:.3e}", flush=True)


if __name__ == "__main__":
    main()
