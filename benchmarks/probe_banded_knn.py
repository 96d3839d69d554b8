"""TPU measurement of the certificate-banded cross-eval KNN build.

VERDICT r4 item 6: warm 60k eval spends ~1.0-1.4 s of ~3 s rebuilding the
KNN from scratch each eval although features drift slowly; selection
(lax.top_k over 60k-wide rows) is ~all of it.  banded_knn reuses last
eval's cluster permutation to scan a narrow band per row block with
per-row ball-bound certification (exact by construction).

Measures, at the production 60k/k=50/d=128 shape on the real chip:
  * full knn_tiled build (the current eval cost);
  * banded_knn on drifting features steered by the cached BSR perm:
    wall, fallback fraction, neighbor-list equality vs knn_tiled;
  * end-to-end cached transductive_laplace s/solve with banded on vs off.

Relay rules (CLAUDE.md): inputs generated ON DEVICE with a time_ns-salted
key (never-seen inputs per timed call), np.asarray sync.

Usage: python benchmarks/probe_banded_knn.py [n] [k]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60_250
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    d, l, k_lab = 128, 10, 250

    import jax
    import jax.numpy as jnp

    from graphlearninglayer_tpu.ops.knn import knn_tiled
    from graphlearninglayer_tpu.ops.knn_banded import banded_knn
    from graphlearninglayer_tpu.ops.transductive import (
        EvalGraphCache, transductive_laplace)

    key = jax.random.PRNGKey(time.time_ns() % (2 ** 31))

    @jax.jit
    def gen(key):
        kc, kl, kx, key = jax.random.split(key, 4)
        centers = 2.0 * jax.random.normal(kc, (l, d))
        lab = jax.random.randint(kl, (n,), 0, l)
        x = centers[lab] + jax.random.normal(kx, (n, d))
        return x / jnp.linalg.norm(x, axis=1, keepdims=True), lab, key

    @jax.jit
    def drift(x, key):
        kd, key = jax.random.split(key)
        x = x + 0.02 * jax.random.normal(kd, x.shape)
        return x / jnp.linalg.norm(x, axis=1, keepdims=True), key

    x, lab, key = gen(key)
    lab_np = np.asarray(lab[:k_lab])
    y = np.zeros((k_lab, l), np.float32)
    y[np.arange(k_lab), lab_np] = 1.0
    yj = jnp.asarray(y)

    # ---- phase 1: full build baseline ----
    nbr_t, d2_t = knn_tiled(x, k)
    _ = np.asarray(nbr_t[-1])
    times = []
    for _ in range(3):
        x, key = drift(x, key)
        t0 = time.perf_counter()
        nbr_t, d2_t = knn_tiled(x, k)
        _ = np.asarray(nbr_t[-1])
        times.append(time.perf_counter() - t0)
    t_full = float(np.median(times))
    print(f"knn_tiled full build: {t_full:.3f}s (median of 3)")

    # ---- phase 2: banded build steered by the production perm ----
    cache = EvalGraphCache()
    p = transductive_laplace(x, yj, knn_num=k, cache=cache)
    _ = np.asarray(p[-1:])
    perm = np.asarray(jax.device_get(cache.perm)).astype(np.int64)
    print(f"perm cached (len {len(perm)})")

    for rep in range(3):
        x, key = drift(x, key)
        t0 = time.perf_counter()
        nbr_b, d2_b, frac = banded_knn(x, k, perm)
        if nbr_b is None:
            print(f"  banded: perm too stale frac={frac:.3f}")
            continue
        _ = np.asarray(nbr_b[-1])
        t_banded = time.perf_counter() - t0
        nbr_t, d2_t = knn_tiled(x, k)
        same = float(np.mean((np.sort(np.asarray(nbr_b), 1)
                              == np.sort(np.asarray(nbr_t), 1)).all(1)))
        print(f"  banded rep{rep}: {t_banded:.3f}s "
              f"({t_full/t_banded:.2f}x) fallback={frac:.3f} "
              f"rows identical to knn_tiled: {same:.4f}")

    # ---- phase 3: end-to-end cached eval, banded off vs on ----
    for flag in ("0", "1"):
        os.environ["GLL_BANDED_KNN"] = flag
        cache = EvalGraphCache()
        p = transductive_laplace(x, yj, knn_num=k, cache=cache)
        _ = np.asarray(p[-1:])
        x, key = drift(x, key)          # warm compile of steady state
        p = transductive_laplace(x, yj, knn_num=k, cache=cache)
        _ = np.asarray(p[-1:])
        ts = []
        for _ in range(3):
            x, key = drift(x, key)
            t0 = time.perf_counter()
            p = transductive_laplace(x, yj, knn_num=k, cache=cache)
            _ = np.asarray(p[-1:])
            ts.append(time.perf_counter() - t0)
        print(f"cached eval end-to-end (banded={flag}): "
              f"{float(np.median(ts)):.3f}s (median of 3)")


if __name__ == "__main__":
    main()
