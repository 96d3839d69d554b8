"""Validate + benchmark the fused Pallas distance+top-k KNN kernel.

Usage:
  python benchmarks/probe_fused_knn.py check            # CPU interpret parity
  python benchmarks/probe_fused_knn.py bench [n] [k]    # TPU timing vs knn_tiled
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

mode = sys.argv[1] if len(sys.argv) > 1 else "check"

import jax

if mode == "check":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from graphlearninglayer_tpu.ops.knn import knn_tiled
from graphlearninglayer_tpu.ops.kernels.knn_topk import fused_knn


def check():
    rng = np.random.default_rng(0)
    for n, d, k in [(300, 17, 10), (1500, 128, 25), (1000, 64, 50),
                    (513, 128, 64)]:
        x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        idx_o, d2_o = knn_tiled(x, k, block=256)
        idx_f, d2_f = fused_knn(x, k, tq=128, tc=128, rt=64, interpret=True)
        dv = np.asarray(d2_f)
        do = np.asarray(d2_o)
        ok_d = np.allclose(dv, do, rtol=1e-5, atol=1e-5)
        # indices can differ on exact ties; compare via distances they imply
        ok_i = bool((np.asarray(idx_f)[:, 0] == np.arange(n)).all())
        print(f"n={n} d={d} k={k}: dist {'OK' if ok_d else 'MISMATCH'} "
              f"selfpin {'OK' if ok_i else 'BAD'} "
              f"maxerr={np.abs(dv - do).max():.2e}", flush=True)
        if not (ok_d and ok_i):
            bad = np.argwhere(~np.isclose(dv, do, rtol=1e-5, atol=1e-5))
            print("  first bad:", bad[:5], dv[tuple(bad[0])] if len(bad) else "",
                  do[tuple(bad[0])] if len(bad) else "")


def bench():
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 60_000
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    d = 128
    rng = np.random.default_rng(time.time_ns())
    xs = [jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
          for _ in range(4)]

    def timeit(name, fn):
        o = fn(xs[0])  # warm
        np.asarray(o[0])
        ts = []
        for x in xs[1:]:
            t0 = time.perf_counter()
            o = fn(x)
            np.asarray(o[0])
            ts.append(time.perf_counter() - t0)
        print(f"{name:28s} {min(ts)*1e3:9.1f} ms", flush=True)
        return o

    o_ref = timeit("knn_tiled(top_k)", lambda x: knn_tiled(x, k, block=4096))
    for tq, tc, rt in [(256, 256, 64), (512, 256, 64), (256, 512, 64),
                       (1024, 256, 64), (512, 512, 64)]:
        try:
            o = timeit(f"fused tq={tq} tc={tc} rt={rt}",
                       lambda x, a=tq, b=tc, c=rt: fused_knn(x, k, a, b, c))
        except Exception as e:
            print(f"fused tq={tq} tc={tc} rt={rt} FAILED "
                  f"{type(e).__name__}: {str(e).splitlines()[0][:100]}",
                  flush=True)
            continue
        ok = np.allclose(np.asarray(o[1]), np.asarray(o_ref[1]),
                         rtol=1e-4, atol=1e-4)
        print(f"   parity vs top_k: {'OK' if ok else 'MISMATCH '}"
              f"{np.abs(np.asarray(o[1]) - np.asarray(o_ref[1])).max():.2e}",
              flush=True)


if mode == "check":
    check()
else:
    bench()
