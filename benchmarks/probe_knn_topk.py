"""TPU probe: isolate the top-k cost inside the tiled KNN.

Variants at 60k x 60k, k=50 (q-block 4096):
  * mm+rowmin    — distance panel + row min only (no top-k): lower bound
  * topk_sort    — lax.top_k over the full row panel
  * amk_1.0      — approx_min_k(recall_target=1.0) (current impl)
  * amk_0.95     — approx_min_k(recall_target=0.95): the hardware
                   PartialReduce path (approximate)
  * amk2_0.95    — two-stage: amk(0.95) per 8192-col chunk + exact merge
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
    d, qb = 128, 4096

    rng = np.random.default_rng(time.time_ns())
    xs = [jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
          for _ in range(6)]

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
                    preferred_element_type=x.dtype)
                d2 = jnp.maximum(qq[:, None] + xx[None, :] - 2.0 * cross, 0.0)
                d2 = jnp.where(
                    rows[:, None] == jnp.arange(n, dtype=jnp.int32)[None, :],
                    -1.0, d2)
                return selector(d2)

            return jax.lax.map(one, (xq.reshape(nq, qb, d), rows_all))
        return jax.jit(run)

    def sel_min(d2):
        return jnp.min(d2, axis=1), jnp.argmin(d2, axis=1)

    def sel_sort(d2):
        nt, i = jax.lax.top_k(-d2, k)
        return -nt, i

    def sel_amk(r):
        return lambda d2: jax.lax.approx_min_k(d2, k, recall_target=r)

    def sel_amk2(d2):
        c = 8192
        pad = (-n) % c
        d2p = jnp.pad(d2, ((0, 0), (0, pad)), constant_values=jnp.inf)
        nc = (n + pad) // c
        dd, ii = jax.lax.approx_min_k(
            d2p.reshape(qb, nc, c).reshape(qb * nc, c), k,
            recall_target=0.95)
        dd = dd.reshape(qb, nc * k)
        gi = (ii.reshape(qb, nc, k)
              + (jnp.arange(nc, dtype=jnp.int32) * c)[None, :, None]
              ).reshape(qb, nc * k)
        nt, sel = jax.lax.top_k(-dd, k)
        return -nt, jnp.take_along_axis(gi, sel, axis=1)

    def sel_chunk_sort(c):
        def sel(d2):
            qb_ = d2.shape[0]
            pad = (-n) % c
            d2p = jnp.pad(d2, ((0, 0), (0, pad)), constant_values=jnp.inf)
            nc = (n + pad) // c
            nt, ii = jax.lax.top_k(-d2p.reshape(qb_ * nc, c), k)
            dd = -nt.reshape(qb_, nc * k)
            gi = (ii.reshape(qb_, nc, k)
                  + (jnp.arange(nc, dtype=jnp.int32) * c)[None, :, None]
                  ).reshape(qb_, nc * k)
            nt2, sel2 = jax.lax.top_k(-dd, k)
            return -nt2, jnp.take_along_axis(gi, sel2, axis=1)
        return sel

    for name, sel in [("mm+rowmin", sel_min), ("topk_sort", sel_sort),
                      ("chunk_sort_4096", sel_chunk_sort(4096)),
                      ("chunk_sort_16384", sel_chunk_sort(16384)),
                      ("amk_1.0", sel_amk(1.0)), ("amk_0.95", sel_amk(0.95)),
                      ("amk2_0.95", sel_amk2)]:
        fn = tiled(sel)
        out = fn(xs[0])
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        times = []
        for x in xs[1:3]:
            t0 = time.perf_counter()
            out = fn(x)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
            times.append(time.perf_counter() - t0)
        print(f"{name:12s} {min(times)*1e3:9.1f} ms", flush=True)

    # recall of the approximate variants vs exact, one block
    f_exact, f_a, f_a2 = tiled(sel_sort), tiled(sel_amk(0.95)), tiled(sel_amk2)
    ie = np.sort(np.asarray(f_exact(xs[3])[1]), axis=-1)
    for nm, f in [("amk_0.95", f_a), ("amk2_0.95", f_a2)]:
        ia = np.sort(np.asarray(f(xs[3])[1]), axis=-1)
        rec = (ia == ie).mean()
        print(f"recall[{nm}] = {rec:.6f}", flush=True)


if __name__ == "__main__":
    main()
