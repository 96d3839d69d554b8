"""Per-stage cost of the 84x84 device-aug path (probe_miniimagenet_aug
measured 5.6 s/batch at B=1500 — find where it goes before optimizing).

Times, at (1500, 84, 84, 3) and for reference (1500, 32, 32, 3):
  * one _warp (the geometric resample; gather fallback at p>2048)
  * equalize (histogram + LUT apply)
  * sharpness (the SMOOTH-filter blend)
  * one full _round_planar
  * the full strong DeviceTransform

Run (TPU): python benchmarks/probe_aug_breakdown.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import graphlearninglayer_tpu.data.device_aug as da

B = 1500


def timeit(name, fn, make_args, iters=4):
    """Relay rules (CLAUDE.md): every timed call gets a NEVER-SEEN input
    (the relay replays cached results for repeated (program, input)
    pairs, silently deflating timings).  Inputs must be generated ON
    DEVICE (jax.random, salted keys) and synced before the timed region —
    host-built arrays of this size would stream through the ~55 MB/s
    relay wire inside the loop and dominate the measurement."""
    np.asarray(jax.device_get(
        jax.tree_util.tree_leaves(fn(*make_args(0)))[0][:1]))
    arg_sets = [jax.block_until_ready(make_args(i + 1))
                for i in range(iters)]
    t0 = time.time()
    outs = [fn(*a) for a in arg_sets]
    for o in outs:
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0][:1]))
    dt = (time.time() - t0) / iters
    print(f"  {name:28s} {dt*1e3:8.1f} ms")
    return dt


def main():
    base_seed = int(time.time_ns()) % 2**31
    keyf = jax.jit(lambda s: jax.random.PRNGKey(s))
    for (h, w, c) in ((84, 84, 3), (32, 32, 3)):
        p = h * w
        print(f"== {B}x{h}x{w}x{c} ==", flush=True)

        @jax.jit
        def gen_x(seed):
            return jax.random.randint(jax.random.PRNGKey(seed), (B, c, p),
                                      0, 256, jnp.int32)

        @jax.jit
        def gen_warp_extra(seed):
            k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
            return (jax.random.randint(k1, (B, p), 0, p, jnp.int32),
                    jax.random.uniform(k2, (B, p)) < 0.97)

        def mk_x(i):
            return (gen_x(base_seed + 131 * i + h),)

        def mk_warp(i):
            return (mk_x(i)[0], *gen_warp_extra(base_seed + 977 * i + h))

        warp = jax.jit(da._warp)
        timeit("warp (one resample)", warp, mk_warp)

        eq = jax.jit(lambda xx: da._apply_lut_planar(
            xx, da._equalize_lut(da._hist_planar(xx), p)))
        timeit("equalize (hist+LUT)", eq, mk_x)

        hist = jax.jit(da._hist_planar)
        timeit("  histogram only", hist, mk_x)

        sharp = jax.jit(lambda xx: da._sharpness_planar(
            xx, jnp.full((B,), 0.7, da._ftype()), h, w))
        timeit("sharpness", sharp, mk_x)

        @jax.jit
        def gen_round_extra(seed):
            k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
            return (jax.random.randint(k1, (B,), 0, 14, jnp.int32),
                    jax.random.uniform(k2, (B,), jnp.float32) * 0.3)

        def mk_round(i):
            return (mk_x(i)[0], *gen_round_extra(base_seed + 313 * i + h))

        rnd = jax.jit(lambda xx, oo, vv: da._round_planar(
            xx, oo, vv.astype(da._ftype()), vv.astype(da._ftype()), h, w))
        timeit("one full round", rnd, mk_round)

        tfm = da.DeviceTransform(
            "miniimagenet" if h == 84 else "cifar10", "strong")
        full = jax.jit(tfm)

        @jax.jit
        def gen_batch(seed):
            return jax.random.randint(jax.random.PRNGKey(seed),
                                      (B, h, w, c), 0, 256,
                                      jnp.int32).astype(jnp.uint8)

        def mk_full(i):
            return (gen_batch(base_seed + 541 * i + h),
                    keyf(base_seed + 7 * i))

        timeit("full strong transform", full, mk_full)


if __name__ == "__main__":
    main()
