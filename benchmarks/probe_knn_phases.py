"""TPU probe: where does the large-graph build spend its time?

Times, at transductive scale (60k nodes, k=50, d=128):
  * knn_tiled alone, at several block sizes
  * a column-chunked two-stage KNN variant (per-chunk approx_min_k fused
    with its matmul, then a tiny merge) — avoids materializing the
    (block, n) distance panel
  * build_graph total (adds union symmetrization: the (n,k,k) recip gather)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chunked_knn(x, k, qblock, cchunk):
    """Two-stage: per column-chunk top-k (fused mm+select), then merge."""
    n, d = x.shape
    pad = (-n) % qblock
    xq = jnp.pad(x, ((0, pad), (0, 0)))
    nq = (n + pad) // qblock
    cpad = (-n) % cchunk
    xx = jnp.pad(jnp.sum(x * x, axis=-1), (0, cpad), constant_values=jnp.inf)
    xc = jnp.pad(x, ((0, cpad), (0, 0)))
    nc = (n + cpad) // cchunk
    rows_all = jnp.arange(n + pad, dtype=jnp.int32).reshape(nq, qblock)

    def one_q(args):
        xb, rows = args
        qq = jnp.sum(xb * xb, axis=-1)

        def one_c(c, carry):
            bd, bi = carry
            cols = c * cchunk + jnp.arange(cchunk, dtype=jnp.int32)
            cross = jax.lax.dot_general(
                xb, jax.lax.dynamic_slice(xc, (c * cchunk, 0), (cchunk, d)),
                (((1,), (1,)), ((), ())), preferred_element_type=x.dtype)
            d2 = (qq[:, None]
                  + jax.lax.dynamic_slice(xx, (c * cchunk,), (cchunk,))[None]
                  - 2.0 * cross)
            d2 = jnp.where(rows[:, None] == cols[None, :], -1.0, d2)
            dd, ii = jax.lax.approx_min_k(d2, k, recall_target=1.0)
            gi = cols[ii]
            bd = jnp.concatenate([bd, dd], axis=1)
            bi = jnp.concatenate([bi, gi], axis=1)
            _, sel = jax.lax.approx_min_k(bd, k, recall_target=1.0)
            return (jnp.take_along_axis(bd, sel, axis=1),
                    jnp.take_along_axis(bi, sel, axis=1))

        bd = jnp.full((qblock, k), jnp.inf, x.dtype)
        bi = jnp.zeros((qblock, k), jnp.int32)
        bd, bi = jax.lax.fori_loop(
            0, nc, lambda c, carry: one_c(c, carry), (bd, bi))
        return bi, jnp.maximum(bd, 0.0)

    idx, dist2 = jax.lax.map(one_q, (xq.reshape(nq, qblock, d), rows_all))
    return idx.reshape(-1, k)[:n], dist2.reshape(-1, k)[:n]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    d = 128
    from graphlearninglayer_tpu.ops.graph import build_graph
    from graphlearninglayer_tpu.ops.knn import knn_tiled

    rng = np.random.default_rng(time.time_ns())
    xs = [jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
          for _ in range(6)]

    def bench(name, fn):
        out = fn(xs[0])
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        times = []
        for x in xs[1:3]:
            t0 = time.perf_counter()
            out = fn(x)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
            times.append(time.perf_counter() - t0)
        print(f"{name:32s} {min(times)*1e3:9.1f} ms", flush=True)
        return out

    for blk in (1024, 4096):
        bench(f"knn_tiled block={blk}",
              lambda x, b=blk: knn_tiled(x, k, b))
    r1 = bench("chunked_knn q=4096 c=8192",
               jax.jit(lambda x: chunked_knn(x, k, 4096, 8192)))
    r0 = knn_tiled(xs[2], k, 2048)
    r1 = jax.jit(lambda x: chunked_knn(x, k, 4096, 8192))(xs[2])
    agree = float(jnp.mean((jnp.sort(r0[0], axis=1)
                            == jnp.sort(r1[0], axis=1)).astype(jnp.float32)))
    print(f"chunked vs tiled index agreement: {agree:.6f}", flush=True)
    bench("build_graph (tiled, 2048)",
          jax.jit(lambda x: build_graph(x, k, "auto", tiled=True,
                                        block=2048).coef))


if __name__ == "__main__":
    main()
