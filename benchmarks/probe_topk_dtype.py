"""TPU probe: does top_k get cheaper in bf16 / with smaller k?

Candidate two-stage exact KNN: cast the f32 distance panel to bf16, select
top-(k+slack) on the half-width panel, exact-refine the f32 distances of
the candidates, verify coverage (bf16 rounding is monotonic, so the true
top-k is covered whenever bf16(exact k-th) < bf16 value of the last
selected candidate).  Only worth building if bf16 selection is actually
faster — that, and the k-scaling of top_k, is what this measures.

Panel: (4096, 60000) blocks over a 60k x 60k distance matrix (the
transductive KNN shape), same tiling as knn_tiled.
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
    d, qb = 128, 4096
    rng = np.random.default_rng(time.time_ns())
    xs = [jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
          for _ in range(3)]

    def tiled(selector):
        def run(x):
            pad = (-n) % qb
            xq = jnp.pad(x, ((0, pad), (0, 0)))
            nq = (n + pad) // qb
            xx = jnp.sum(x * x, axis=-1)
            rows_all = jnp.arange(n + pad, dtype=jnp.int32).reshape(nq, qb)

            def one(args):
                xb, rows = args
                qq = jnp.sum(xb * xb, axis=-1)
                cross = jax.lax.dot_general(
                    xb, x, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                d2 = jnp.maximum(qq[:, None] + xx[None, :] - 2.0 * cross, 0.0)
                d2 = jnp.where(
                    rows[:, None] == jnp.arange(n, dtype=jnp.int32)[None, :],
                    -1.0, d2)
                return selector(d2)
            return jax.lax.map(one, (xq.reshape(nq, qb, d), rows_all))
        return jax.jit(run)

    def timeit(name, sel):
        fn = tiled(sel)
        out = fn(xs[0])
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts = []
        for x in xs[1:]:
            t0 = time.perf_counter()
            out = fn(x)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
            ts.append(time.perf_counter() - t0)
        print(f"{name:24s} {min(ts)*1e3:9.1f} ms", flush=True)

    def sel_topk_f32(k):
        def sel(d2):
            nt, i = jax.lax.top_k(-d2, k)
            return -nt, i
        return sel

    def sel_topk_bf16(k):
        def sel(d2):
            nt, i = jax.lax.top_k(-d2.astype(jnp.bfloat16), k)
            return -nt, i
        return sel

    def sel_topk_int(k):
        # positive f32s are order-isomorphic to their int32 bit patterns
        def sel(d2):
            key = jax.lax.bitcast_convert_type(d2 + 1.0, jnp.int32)
            nt, i = jax.lax.top_k(-key, k)
            return -nt, i
        return sel

    def sel_bf16_refine(k, slack):
        kk = k + slack
        def sel(d2):
            _, cand = jax.lax.top_k(-d2.astype(jnp.bfloat16), kk)
            dsel = jnp.take_along_axis(d2, cand, axis=1)
            nt, j = jax.lax.top_k(-dsel, k)
            return -nt, jnp.take_along_axis(cand, j, axis=1)
        return sel

    timeit("topk_f32 k=50", sel_topk_f32(50))
    timeit("topk_f32 k=8", sel_topk_f32(8))
    timeit("topk_f32 k=128", sel_topk_f32(128))
    timeit("topk_bf16 k=50", sel_topk_bf16(50))
    timeit("topk_bf16 k=64", sel_topk_bf16(64))
    timeit("topk_int32 k=50", sel_topk_int(50))
    timeit("bf16+refine k=50+14", sel_bf16_refine(50, 14))

    # exactness of bf16+refine vs f32 top_k (distances, not indices)
    f_e = tiled(sel_topk_f32(50))
    f_r = tiled(sel_bf16_refine(50, 14))
    de = np.asarray(f_e(xs[1])[0])
    dr = np.asarray(f_r(xs[1])[0])
    print("bf16+refine max |d2 - exact| =", np.abs(de - dr).max(), flush=True)


if __name__ == "__main__":
    main()
