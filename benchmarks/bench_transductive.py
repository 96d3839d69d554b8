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
    # per-process salt: the execution relay replays cached results for
    # (program, input) pairs it has seen in ANY previous process, so reruns
    # with a fixed seed would time the cache, not the TPU
    salt = np.random.default_rng(time.time_ns())
    x += 1e-4 * salt.normal(size=x.shape).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    y = np.zeros((k_lab, l), np.float32)
    y[np.arange(k_lab), lab[:k_lab]] = 1.0

    xj = jnp.asarray(x)
    yj = jnp.asarray(y)

    # distinct inputs per rep: the execution relay replays cached results for
    # identical (program, input) pairs, which would fake the timing
    xs = [jnp.asarray(x + 1e-4 * rng.normal(size=x.shape).astype(np.float32))
          for _ in range(5)]
    from graphlearninglayer_tpu.ops import EvalGraphCache
    for mode in modes:
        # np.asarray (device->host copy) is the sync point: the relay's
        # block_until_ready can return before execution finishes, and every
        # call gets a NEVER-seen input (replay cache defeats both).
        # The EvalGraphCache is the PRODUCTION eval configuration (round
        # 4): it pins the compiled static shapes across solves (without
        # it, per-input jitter in the data-dependent smax/ovf budgets can
        # recompile the bsr solve on every rep), reuses the cluster
        # permutation, and warm-starts CG.
        cache = EvalGraphCache()
        # TWO warmups: the first compiles the cold (no-x0) programs and
        # primes the cache; the second compiles the warm-start (x0)
        # program variants the steady state actually runs
        for i in range(2):
            p = transductive_laplace(xs[i], yj, knn_num=k, mode=mode,
                                     cache=cache)
            _ = np.asarray(p)
        t0 = time.perf_counter()
        reps = 3
        for i in range(reps):
            p = transductive_laplace(xs[2 + i], yj, knn_num=k, mode=mode,
                                     cache=cache)
            _ = np.asarray(p)
        dt = (time.perf_counter() - t0) / reps
        print(f"transductive[{mode:8s}] n={n} k={k}: {dt*1e3:9.1f} ms/solve "
              f"(pred sum {float(np.asarray(p).sum()):.3f})", flush=True)

    # isolate the matvec itself
    from graphlearninglayer_tpu.ops.transductive import _build
    g = _build(xj, k, "auto", 2048)
    jax.block_until_ready(g.nbr)
    w, _ = edge_weights(g)
    n_dir_edges = int(np.asarray((g.coef > 0).sum()))

    # NB: graphs/tiles are passed as ARGUMENTS (jit-closing over them would
    # bake them into the HLO and blow the remote-compile size limit)
    fns = {}
    fns["scatter"] = (jax.jit(sym_spmm), (g, w))
    if "ell" in modes:
        cap = min(ell_cap(int(max_in_degree(g))), 512)
        ovf = int(overflow_count(g, cap))
        ovf_cap = 0 if ovf == 0 else -(-ovf // 4096) * 4096
        ell = jax.jit(build_sym_ell, static_argnums=(2, 3))(g, w, cap,
                                                            ovf_cap)
        jax.block_until_ready(ell.val)
        print(f"ell cap={cap} slots/row={g.k + cap} overflow={ovf} "
              f"(padded {ovf_cap})", flush=True)
        fns["ell"] = (jax.jit(ell_spmm), (ell,))
    if "bsr" in modes:
        from graphlearninglayer_tpu.ops.bsr import (bsr_plan, bsr_spmm,
                                                    bsr_stats,
                                                    bsr_tile_bytes,
                                                    build_bsr_mat)
        blk = 256
        plan = bsr_plan(xj, g, k_lab, max(8, min(512, n // 1024)), blk)
        hist = np.asarray(jax.device_get(bsr_stats(plan, blk)), np.int64)
        cum = np.cumsum(hist)
        smax = -(-int(np.searchsorted(cum, 0.99 * cum[-1]) + 1) // 8) * 8
        # honor the library's tile-memory budget: at 120k+ an uncapped
        # 99%-coverage smax materializes >5 GiB of tiles and OOMs this
        # micro-section (the library path declines/falls back instead)
        budget_slots = (4 << 30) // ((-(-n // blk)) * blk * blk * 4)
        smax = max(min(smax, budget_slots // 8 * 8), 8)
        ovf = int(cum[-1] - cum[min(smax, len(cum)) - 1])
        ovf_cap = 0 if ovf == 0 else -(-ovf // 4096) * 4096
        if ovf > 0.25 * cum[-1]:
            print(f"bsr micro-section skipped: overflow {ovf} > 25% of "
                  f"{int(cum[-1])} at budget-capped smax={smax} (the "
                  "solve path falls back to 'sorted' here)", flush=True)
        else:
            wp, _ = edge_weights(plan.gp)
            build = jax.jit(build_bsr_mat, static_argnums=(2, 3, 4))
            mat = build(plan, wp, blk, smax, ovf_cap)
            _ = np.asarray(mat.colblocks)
            print(f"bsr block={blk} smax={smax} overflow={ovf} tiles="
                  f"{bsr_tile_bytes(n, blk, smax)/2**30:.2f} GiB",
                  flush=True)
            # phase breakdown (warm): plan (kmeans+permute+structure),
            # then build
            xf = jnp.asarray(x + 1e-4 * salt.normal(size=x.shape)
                             .astype(np.float32))    # never-seen input
            t0 = time.perf_counter()
            plan2 = bsr_plan(xf, g, k_lab, max(8, min(512, n // 1024)),
                             blk)
            _ = np.asarray(plan2.max_blocks)
            t1 = time.perf_counter()
            mat2 = build(plan2, wp, blk, smax, ovf_cap)
            _ = np.asarray(mat2.colblocks)
            t2 = time.perf_counter()
            print(f"bsr phases: plan {t1-t0:.3f}s  build {t2-t1:.3f}s",
                  flush=True)
            fns["bsr"] = (jax.jit(bsr_spmm, static_argnums=(2,)), (mat,))

    reps = 24
    vecs = [jnp.asarray(rng.normal(size=(n, l)).astype(np.float32))
            for _ in range(reps + 1)]                # all distinct: no replay
    for name, (fn, args) in fns.items():
        extra = (n,) if name == "bsr" else ()
        _ = np.asarray(fn(*args, vecs[-1], *extra))
        t0 = time.perf_counter()
        for i in range(reps):
            out = fn(*args, vecs[i], *extra)
        _ = np.asarray(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"sym_spmm  [{name:8s}] {n_dir_edges} dir-edges: "
              f"{dt*1e3:8.3f} ms  ({n_dir_edges/dt:.3e} edges/s)",
              flush=True)


if __name__ == "__main__":
    main()
