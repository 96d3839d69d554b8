"""Benchmark: graph Laplace-learning op fwd+bwd steps/sec on TPU.

Measures the full custom-vjp op (KNN graph build + Laplacian solve + implicit
-diff backward) at the reference's default training shape — 1,500-node graph
(250 base + 1,250 batch), k=25, 128-d features, 10 classes (SURVEY.md §6) —
and compares against the scipy/SuperLU reference pipeline (the vendored
oracle reproducing GLL.py:10-177) running on the host CPU, i.e. exactly what
the reference executes per training step regardless of its GPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def bench_tpu(x_np, y_np, gbar_np, iters=64):
    import jax
    import jax.numpy as jnp

    from graphlearninglayer_tpu.ops import laplace_learning

    y = jnp.asarray(y_np)
    gbar = jnp.asarray(gbar_np)
    # EVERY timed call gets a never-before-seen input: the execution
    # infrastructure replays cached results for (program, input) pairs it
    # has seen in any previous run, so repeated or fixed-seed inputs would
    # time the cache instead of the TPU
    rng = np.random.default_rng(time.time_ns())
    xs = [jnp.asarray(x_np + 1e-3 * rng.normal(size=x_np.shape)
                      .astype(np.float32)) for _ in range(iters + 1)]

    @jax.jit
    def fwd_bwd(x):
        def loss(x):
            return jnp.sum(laplace_learning(x, y, tau=0.07, epsilon="auto",
                                            k=25) * gbar)
        return jax.value_and_grad(loss)(x)

    # compile + warmup; np.asarray (device->host copy) is the sync point —
    # the relay's block_until_ready can return before execution finishes
    val, grad = fwd_bwd(xs[-1])
    _ = np.asarray(grad)
    t0 = time.perf_counter()
    for i in range(iters):
        val, grad = fwd_bwd(xs[i])
    _ = np.asarray(grad)
    dt = (time.perf_counter() - t0) / iters
    return dt


def bench_reference(x_np, y_np, gbar_np, iters=3):
    sys.path.insert(0, ".")
    from tests.oracle import reference_op as ref

    # warmup
    pred, ctx = ref.forward(x_np, y_np, tau=0.07, epsilon="auto", k=25)
    ref.backward(ctx, gbar_np)
    t0 = time.perf_counter()
    for _ in range(iters):
        pred, ctx = ref.forward(x_np, y_np, tau=0.07, epsilon="auto", k=25)
        ref.backward(ctx, gbar_np)
    return (time.perf_counter() - t0) / iters


def _cluster_features(n, d, l, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(l, d)).astype(np.float32) * 2.0
    lab = rng.integers(0, l, n)
    x = centers[lab] + rng.normal(size=(n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x, lab


def bench_transductive_tpu(x_np, y_np, k, reps=3):
    """Warm cached 60k transductive eval (the production big-graph path:
    EvalGraphCache = sticky compiled shapes + perm reuse + CG warm start).
    Returns (s/solve, directed-edge count, mean CG iters)."""
    import jax
    import jax.numpy as jnp

    from graphlearninglayer_tpu.ops import EvalGraphCache, transductive_laplace

    yj = jnp.asarray(y_np)
    xd = jnp.asarray(x_np)
    # fresh NEVER-seen input per call, generated ON DEVICE (host-built
    # arrays would stream through the ~55MB/s relay wire inside the timed
    # loop); time_ns salt defeats the relay's cross-process replay cache
    key = jax.random.PRNGKey(time.time_ns() % (2 ** 31))

    @jax.jit
    def perturb(key):
        k1, key = jax.random.split(key)
        x = xd + 1e-4 * jax.random.normal(k1, xd.shape, xd.dtype)
        return x / jnp.linalg.norm(x, axis=1, keepdims=True), key

    cache = EvalGraphCache()
    # two warmups: first compiles the cold (no-x0) programs and primes the
    # cache, second compiles the warm-start variants the steady state runs
    iters_seen = []
    for _ in range(2):
        x, key = perturb(key)
        p, it, _ = transductive_laplace(x, yj, knn_num=k, return_info=True,
                                        cache=cache)
        _ = np.asarray(p[-1:])
    t0 = time.perf_counter()
    for _ in range(reps):
        x, key = perturb(key)
        p, it, _ = transductive_laplace(x, yj, knn_num=k, return_info=True,
                                        cache=cache)
        iters_seen.append(int(np.asarray(it)))
        _ = np.asarray(p[-1:])          # device->host sync, tiny slice
    dt = (time.perf_counter() - t0) / reps
    n = x_np.shape[0]
    return dt, n * k, float(np.mean(iters_seen))


def bench_transductive_reference(x, y, k):
    """The reference's transductive eval pipeline (laplace(), utils.py:
    556-593: KNN graph over all nodes -> gaussian affinity w/ auto-eps ->
    Jacobi-preconditioned CG to tol 1e-10, stable_conjgrad GLL.py:247-276)
    on the host CPU with numpy/scipy — what the reference actually runs
    per eval epoch.  One rep (it is slow)."""
    import scipy.sparse as sp

    n, d = x.shape
    k_lab, l = y.shape
    t0 = time.perf_counter()
    # exact KNN, panel chunked to bound memory (the reference uses annoy's
    # approximate index; exact chunked numpy is the same output and not
    # slower than annoy's build+query at this scale)
    chunk = 2048
    nbr = np.empty((n, k), np.int64)
    nbd = np.empty((n, k), np.float32)
    for i in range(0, n, chunk):
        j = min(i + chunk, n)
        panel = (x[i:j] ** 2).sum(1)[:, None] + (x ** 2).sum(1)[None] \
            - 2.0 * (x[i:j] @ x.T)
        idx = np.argpartition(panel, k, axis=1)[:, :k + 1]
        pd = np.take_along_axis(panel, idx, 1)
        order = np.argsort(pd, axis=1)
        idx = np.take_along_axis(idx, order, 1)
        pd = np.take_along_axis(pd, order, 1)
        # drop self column, keep k nearest others
        self_col = idx == (np.arange(i, j)[:, None])
        keep = np.where(self_col.any(1)[:, None], ~self_col,
                        np.ones_like(self_col, bool))
        for r in range(j - i):
            cols = idx[r][keep[r]][:k]
            nbr[i + r] = cols
            nbd[i + r] = np.sqrt(np.maximum(pd[r][keep[r]][:k], 0))
    eps = np.maximum(nbd[:, -1], 1e-6)
    rows = np.repeat(np.arange(n), k)
    cols = nbr.ravel()
    dist = nbd.ravel()
    wv = np.exp(-4.0 * dist * dist / (eps[rows] * eps[cols]))
    W = sp.csr_matrix((wv, (rows, cols)), shape=(n, n))
    W = W.maximum(W.T)                      # union symmetrization
    deg = np.asarray(W.sum(1)).ravel()
    L = sp.diags(deg) - W
    luu = L[k_lab:, k_lab:].tocsr()
    rhs = np.asarray(-L[k_lab:, :k_lab] @ y)   # = W_ul @ Y
    # Jacobi-preconditioned multi-RHS CG to tol 1e-10 (GLL.py:247-276)
    Minv = 1.0 / luu.diagonal()
    u = np.zeros_like(rhs)
    r = rhs - luu @ u
    z = Minv[:, None] * r
    p = z
    rz = (r * z).sum(0)
    for _ in range(1000):
        Ap = luu @ p
        alpha = rz / np.maximum((p * Ap).sum(0), 1e-300)
        u = u + alpha * p
        r = r - alpha * Ap
        if np.max(np.linalg.norm(r, axis=0)) < 1e-10:
            break
        z = Minv[:, None] * r
        rz_new = (r * z).sum(0)
        p = z + (rz_new / np.maximum(rz, 1e-300)) * p
        rz = rz_new
    _ = u.sum()
    return time.perf_counter() - t0


def main():
    n_base, n_batch, d, l = 250, 1250, 128, 10
    n = n_base + n_batch
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)  # unit-norm features
    labels = rng.integers(0, l, n_base)
    y = np.zeros((n_base, l), np.float32)
    y[np.arange(n_base), labels] = 1.0
    gbar = rng.normal(size=(n_batch, l)).astype(np.float32)

    dt_tpu = bench_tpu(x, y, gbar)
    dt_ref = bench_reference(x.astype(np.float64), y.astype(np.float64),
                             gbar.astype(np.float64))

    steps_per_s = 1.0 / dt_tpu
    vs_baseline = dt_ref / dt_tpu
    print(json.dumps({
        "metric": "gll_fwd_bwd_steps_per_s",
        "value": round(steps_per_s, 3),
        "unit": "steps/s",
        "vs_baseline": round(vs_baseline, 2),
    }), flush=True)

    # second metric: the big-graph transductive eval (reference laplace(),
    # utils.py:556-593 — ~60k nodes for CIFAR-10, k=50) on the cached
    # production path, vs the same scipy pipeline on the host CPU
    n_eval, k_eval, k_lab = 60_000, 50, 250
    xe, lab_e = _cluster_features(n_eval, d, l, seed=1)
    ye = np.zeros((k_lab, l), np.float32)
    ye[np.arange(k_lab), lab_e[:k_lab]] = 1.0
    dt_eval, edges, cg_iters = bench_transductive_tpu(xe, ye, k_eval)
    dt_eval_ref = bench_transductive_reference(xe, ye, k_eval)
    print(json.dumps({
        "metric": "transductive_eval_60k_s_per_solve",
        "value": round(dt_eval, 4),
        "unit": "s",
        "vs_baseline": round(dt_eval_ref / dt_eval, 2),
        "edges_per_s": round(edges * cg_iters / dt_eval, 0),
        "cg_iters": cg_iters,
        "baseline_cpu_s": round(dt_eval_ref, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
