"""Benchmark the large-graph transductive eval path (reference utils.py:570).

Times ``transductive_laplace`` at CIFAR-scale (60k nodes, k=50, d=128,
l=10) for each matvec mode:

  * scatter — single-jit path, in-edge half scatter-added every CG iteration
  * ell     — two-stage path over the combined symmetric ELL structure
              (pure gather matvec; see ops/graph.py)

Usage:  python benchmarks/bench_transductive.py [n] [k] [mode ...]

Prints per-mode wall time and effective symmetric-SpMM edge throughput
(directed edges x CG iterations / solve seconds is not recoverable without
instrumenting the loop, so we report end-to-end solve time and edges/s for
one timed spmm separately).
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
    modes = sys.argv[3:] or ["scatter", "ell"]
    d, l, k_lab = 128, 10, 250

    from graphlearninglayer_tpu.ops import transductive_laplace
    from graphlearninglayer_tpu.ops.graph import (build_sym_ell,
                                                  edge_weights, ell_cap,
                                                  ell_spmm, max_in_degree,
                                                  overflow_count, sym_spmm)

    rng = np.random.default_rng(0)
    # clustered features so the graph is non-trivial but connected-ish
    centers = rng.normal(size=(l, d)).astype(np.float32) * 2.0
    lab = rng.integers(0, l, n)
    x = centers[lab] + rng.normal(size=(n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    y = np.zeros((k_lab, l), np.float32)
    y[np.arange(k_lab), lab[:k_lab]] = 1.0

    xj = jnp.asarray(x)
    yj = jnp.asarray(y)

    # distinct inputs per rep: the execution relay replays cached results for
    # identical (program, input) pairs, which would fake the timing
    xs = [jnp.asarray(x + 1e-4 * rng.normal(size=x.shape).astype(np.float32))
          for _ in range(4)]
    for mode in modes:
        p = transductive_laplace(xs[0], yj, knn_num=k, mode=mode)
        jax.block_until_ready(p)
        t0 = time.perf_counter()
        reps = 3
        for i in range(reps):
            p = transductive_laplace(xs[1 + i], yj, knn_num=k, mode=mode)
            jax.block_until_ready(p)
        dt = (time.perf_counter() - t0) / reps
        print(f"transductive[{mode:8s}] n={n} k={k}: {dt*1e3:9.1f} ms/solve",
              flush=True)

    # isolate the matvec itself
    from graphlearninglayer_tpu.ops.transductive import _build
    g = _build(xj, k, "auto", 2048)
    jax.block_until_ready(g.nbr)
    w, _ = edge_weights(g)
    n_dir_edges = int(np.asarray((g.coef > 0).sum()))

    spmm_scatter = jax.jit(lambda v: sym_spmm(g, w, v))
    cap = min(ell_cap(int(max_in_degree(g))), 512)
    ovf = int(overflow_count(g, cap))
    ovf_cap = 0 if ovf == 0 else -(-ovf // 4096) * 4096
    ell = jax.jit(build_sym_ell, static_argnums=(2, 3))(g, w, cap, ovf_cap)
    jax.block_until_ready(ell.val)
    spmm_ell = jax.jit(lambda v: ell_spmm(ell, v))

    vecs = [jnp.asarray(rng.normal(size=(n, l)).astype(np.float32))
            for _ in range(8)]
    for name, fn in [("scatter", spmm_scatter), ("ell", spmm_ell)]:
        jax.block_until_ready(fn(vecs[0]))
        t0 = time.perf_counter()
        reps = 24
        for i in range(reps):
            out = fn(vecs[i % len(vecs)])
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"sym_spmm  [{name:8s}] {n_dir_edges} dir-edges: "
              f"{dt*1e3:8.3f} ms  ({n_dir_edges/dt:.3e} edges/s)",
              flush=True)
    print(f"ell cap={cap} slots/row={g.k + cap} overflow={ovf} "
          f"(padded {ovf_cap})")


if __name__ == "__main__":
    main()
