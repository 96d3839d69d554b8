"""Probe: symmetric-ELL SpMM formulations on TPU at transductive scale.

Variants (same math, different XLA lowering):
  scatter   — out-edge gather einsum + in-edge scatter-add (original)
  cls1d     — per-class 1D gather: g_c = x_c[nbr_flat]; out_c = sum_s val*g
  sortedseg — edges pre-sorted by destination; per matvec one sorted
              segment-sum of (E, l) contributions
"""
from __future__ import annotations

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
    d, l = 128, 10

    from graphlearninglayer_tpu.ops.graph import (build_sym_ell,
                                                  edge_weights, ell_cap,
                                                  max_in_degree,
                                                  overflow_count, sym_spmm)
    from graphlearninglayer_tpu.ops.transductive import _build

    rng = np.random.default_rng(0)
    centers = rng.normal(size=(l, d)).astype(np.float32) * 2.0
    lab = rng.integers(0, l, n)
    x = centers[lab] + rng.normal(size=(n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    xj = jnp.asarray(x)

    g = _build(xj, k, "auto", 2048)
    jax.block_until_ready(g.nbr)
    w, _ = edge_weights(g)
    cap = min(ell_cap(int(max_in_degree(g))), 512)
    ovf = int(overflow_count(g, cap))
    ovf_cap = 0 if ovf == 0 else -(-ovf // 4096) * 4096
    ell = jax.jit(build_sym_ell, static_argnums=(2, 3))(g, w, cap, ovf_cap)
    jax.block_until_ready(ell.val)
    n_edges = int(np.asarray((g.coef > 0).sum()))
    print(f"n={n} k={k} cap={cap} ovf={ovf} dir_edges={n_edges}", flush=True)

    # every variant takes ALL its data as arguments — closing over the big
    # arrays would bake them into the HLO as constants (the remote-compile
    # relay rejects >100MB programs, and it distorts memory planning)
    def spmm_scatter(nbr, coefw, v):
        out = jnp.einsum("nk,nkl->nl", coefw, v[nbr])
        contrib = (coefw[:, :, None] * v[:, None, :]).reshape(-1, v.shape[1])
        return out + jax.ops.segment_sum(contrib, nbr.reshape(-1),
                                         num_segments=n)

    S = ell.nbr.shape[1]

    def _ovf(out, ell_ovf, v):
        ovf_dst, ovf_src, ovf_val = ell_ovf
        return out.at[ovf_dst].add(ovf_val[:, None] * v[ovf_src],
                                   mode="drop")

    def spmm_cls1d(ell_nbr, ell_val, ell_ovf, v):
        flat = ell_nbr.reshape(-1)
        cols = []
        for c in range(l):
            gc = jnp.take(v[:, c], flat, axis=0).reshape(n, S)
            cols.append(jnp.sum(ell_val * gc, axis=1))
        return _ovf(jnp.stack(cols, axis=1), ell_ovf, v)

    def spmm_take1(ell_nbr, ell_val, ell_ovf, v):
        gathered = jnp.take(v.T, ell_nbr, axis=1)       # (l, n, S)
        out = jnp.sum(ell_val[None, :, :] * gathered, axis=2).T
        return _ovf(out, ell_ovf, v)

    # sorted-by-destination COO (precomputed once)
    c_np = np.asarray(g.coef * w).reshape(-1)
    dst_np = np.asarray(g.nbr).reshape(-1)
    src_np = np.repeat(np.arange(n, dtype=np.int32), k)
    order = np.argsort(dst_np, kind="stable")
    dst_s = jnp.asarray(dst_np[order])
    src_s = jnp.asarray(src_np[order])
    c_s = jnp.asarray(c_np[order])

    def spmm_sortedseg(nbr, coefw, dst, src, cs, v):
        out = jnp.einsum("nk,nkl->nl", coefw, v[nbr])  # out-half
        contrib = cs[:, None] * v[src]
        return out + jax.ops.segment_sum(contrib, dst, num_segments=n,
                                         indices_are_sorted=True)

    vecs = [jnp.asarray(rng.normal(size=(n, l)).astype(np.float32))
            for _ in range(8)]
    coefw = g.coef * w
    ell_ovf = (ell.ovf_dst, ell.ovf_src, ell.ovf_val)
    variants = [
        ("scatter", spmm_scatter, (g.nbr, coefw)),
        ("cls1d", spmm_cls1d, (ell.nbr, ell.val, ell_ovf)),
        ("take1", spmm_take1, (ell.nbr, ell.val, ell_ovf)),
        ("sortedseg", spmm_sortedseg, (g.nbr, coefw, dst_s, src_s, c_s)),
    ]
    ref = None
    for name, fn, data in variants:
        try:
            jf = jax.jit(fn)
            out0 = jax.block_until_ready(jf(*data, vecs[0]))
            if ref is None:
                ref = np.asarray(out0)
            else:
                err = float(np.max(np.abs(np.asarray(out0) - ref)))
                print(f"  {name}: max|diff vs scatter| = {err:.2e}",
                      flush=True)
            t0 = time.perf_counter()
            reps = 24
            for i in range(reps):
                out = jf(*data, vecs[i % len(vecs)])
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / reps
            print(f"  {name:10s}: {dt*1e3:8.3f} ms  "
                  f"({n_edges/dt:.3e} edges/s)", flush=True)
        except Exception as e:  # noqa: BLE001 — probe reports and moves on
            print(f"  {name:10s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
