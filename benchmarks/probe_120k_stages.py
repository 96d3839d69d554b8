"""Which stage of the single-chip transductive path OOMs at n=120k?

Runs build / sorted-solve / bsr-solve separately with sync inside a
try/except so the failing stage is identified (the driver-level fallback
can only work if execution-time errors surface inside its guard).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

n = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
k = int(sys.argv[2]) if len(sys.argv) > 2 else 50
d, l, k_lab = 128, 10, 250

from graphlearninglayer_tpu.ops.transductive import (_build, _solve_sorted,
                                                     _transductive_bsr)

rng = np.random.default_rng(time.time_ns())
centers = rng.normal(size=(l, d)).astype(np.float32) * 2.0
lab = rng.integers(0, l, n)
x = centers[lab] + rng.normal(size=(n, d)).astype(np.float32)
x /= np.linalg.norm(x, axis=1, keepdims=True)
y = np.zeros((k_lab, l), np.float32)
y[np.arange(k_lab), lab[:k_lab]] = 1.0
xj, yj = jnp.asarray(x), jnp.asarray(y)


def stage(name, fn):
    t0 = time.perf_counter()
    try:
        out = fn()
        leaves = jax.tree_util.tree_leaves(out)
        if not leaves:
            print(f"{name:12s} DECLINED (returned None) "
                  f"{time.perf_counter()-t0:7.1f}s", flush=True)
            return None
        jax.block_until_ready(out)
        np.asarray(jax.device_get(leaves[0]))[:1]
        print(f"{name:12s} OK   {time.perf_counter()-t0:7.1f}s", flush=True)
        return out
    except Exception as e:
        print(f"{name:12s} FAIL {time.perf_counter()-t0:7.1f}s "
              f"{str(e).splitlines()[0][:100]}", flush=True)
        return None


g = stage("build", lambda: _build(xj, k, "auto", 2048))
if g is not None:
    stage("sorted", lambda: _solve_sorted(g, yj, 1e-8))
    stage("bsr", lambda: _transductive_bsr(xj, g, yj, 1e-8, 256, 4 << 30))

# warm pass on never-seen inputs (the relay replays cached (program, input)
# pairs; warm timings need fresh data each call)
x2 = centers[lab] + rng.normal(size=(n, d)).astype(np.float32)
x2 /= np.linalg.norm(x2, axis=1, keepdims=True)
xj2 = jnp.asarray(x2)
g2 = stage("build/warm", lambda: _build(xj2, k, "auto", 2048))
if g2 is not None:
    out = stage("sorted/warm", lambda: _solve_sorted(g2, yj, 1e-8))
    if out is not None:
        # solve time scales with CG iterations (a conditioning property of
        # the data/labeled fraction, not a kernel property) — report them
        _, iters, err = out
        print(f"             sorted CG iters={int(iters)} "
              f"err={float(np.asarray(err)):.2e}", flush=True)
    stage("bsr/warm",
          lambda: _transductive_bsr(xj2, g2, yj, 1e-8, 256, 4 << 30))
