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


def timeit(name, fn, *args, iters=5):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(fn(*args))[0][:1]))
    t0 = time.time()
    outs = [fn(*args) for _ in range(iters)]
    for o in outs:
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0][:1]))
    dt = (time.time() - t0) / iters
    print(f"  {name:28s} {dt*1e3:8.1f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    for (h, w, c) in ((84, 84, 3), (32, 32, 3)):
        p = h * w
        print(f"== {B}x{h}x{w}x{c} ==", flush=True)
        x = jnp.asarray(rng.integers(0, 256, (B, c, p)).astype(np.int32)
                        + int(time.time_ns() % 3))
        src = jnp.asarray(rng.integers(0, p, (B, p)).astype(np.int32))
        valid = jnp.asarray(rng.random((B, p)) < 0.97)

        warp = jax.jit(da._warp)
        timeit("warp (one resample)", warp, x, src, valid)

        eq = jax.jit(lambda xx: da._apply_lut_planar(
            xx, da._equalize_lut(da._hist_planar(xx), p)))
        timeit("equalize (hist+LUT)", eq, x)

        hist = jax.jit(da._hist_planar)
        timeit("  histogram only", hist, x)

        sharp = jax.jit(lambda xx: da._sharpness_planar(
            xx, jnp.full((B,), 0.7, da._ftype()), h, w))
        timeit("sharpness", sharp, x)

        op = jnp.asarray(rng.integers(0, 14, (B,)).astype(np.int32))
        v = jnp.asarray(rng.random(B).astype(np.float32) * 0.3)
        rnd = jax.jit(lambda xx, oo, vv: da._round_planar(
            xx, oo, vv.astype(da._ftype()), vv.astype(da._ftype()), h, w))
        timeit("one full round", rnd, x, op, v)

        tfm = da.DeviceTransform(
            "miniimagenet" if h == 84 else "cifar10", "strong")
        batch = jnp.asarray(rng.integers(0, 256, (B, h, w, c), np.uint8))
        full = jax.jit(tfm)
        timeit("full strong transform", full, batch,
               jax.random.PRNGKey(int(time.time_ns()) % 2**31))


if __name__ == "__main__":
    main()
