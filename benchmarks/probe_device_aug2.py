"""TPU probe: candidate layouts/formulations for fast in-jit augmentation.

probe_device_aug.py showed EVERY stage of the (B, H, W, C) vmapped
augmentation is slow — at C=1 even the pure-elementwise cutout costs
24 ms for 1500 images, because the trailing C=1/3 axis is lane-padded to
128 (CLAUDE.md TPU lore) so every intermediate wastes 128/42x the VPU
lanes and HBM bytes.  Candidates measured here, all on the planar-flat
layout (B*C, H*W) (trailing dim 1024 -> full lanes):

  cutout-planar      elementwise mask select on (B, HW)
  lut-arith          brightness-style affine LUT applied arithmetically
  gather-tala        warp as take_along_axis (B, HW) <- (B, HW) indices
  gather-take1d      warp as per-image flat 1-D take (vmapped)
  warp-matmul        warp as per-image onehot (HW, HW) @ (HW,) matmul (bf16)
  lut-matmul         256-entry table lookup as onehot (HW, 256) @ (256,)
  histogram-planar   per-image (256,) histogram via compare+reduce

B=1500 grayscale-sized; min of 3 x 8 chained launches, salted inputs,
np.asarray sync.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, HW = 1500, 1024
STEPS = 8


def timeit(name, launch, reps=STEPS):
    launch()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = launch()
        _ = np.asarray(out)
        ts.append((time.perf_counter() - t0) / reps)
    print(f"{name:16s} {min(ts)*1e3:9.2f} ms", flush=True)
    return min(ts)


def main():
    rng = np.random.default_rng(time.time_ns())
    imgs = jnp.asarray(rng.integers(0, 256, (B, HW), np.int32))
    src = jnp.asarray(rng.integers(0, HW, (B, HW), np.int32))
    kbox = [jax.random.PRNGKey(int(rng.integers(1 << 30)))]

    def next_key():
        kbox[0] = jax.random.fold_in(kbox[0], 1)
        return kbox[0]

    # --- cutout in planar layout ---------------------------------------
    @jax.jit
    def cut(x, k):
        u = jax.random.uniform(k, (B, 3))
        w = 32
        v = u[:, 0] * 0.5 * w
        x0 = jnp.maximum(0.0, u[:, 1] * w - v / 2)
        y0 = jnp.maximum(0.0, u[:, 2] * w - v / 2)
        xs = jnp.arange(w, dtype=jnp.float32)
        mx = (xs[None] >= x0[:, None]) & (xs[None] <= (x0 + v)[:, None])
        my = (xs[None] >= y0[:, None]) & (xs[None] <= (y0 + v)[:, None])
        mask = (my[:, :, None] & mx[:, None, :]).reshape(B, HW)
        return jnp.where(mask, 125, x)

    timeit("cutout-planar", lambda: cut(imgs, next_key()))

    # --- arithmetic LUT (brightness) ------------------------------------
    @jax.jit
    def lar(x, k):
        v = jax.random.uniform(k, (B, 1))
        return jnp.clip(jnp.trunc(x.astype(jnp.float32) * v), 0,
                        255).astype(jnp.int32)

    timeit("lut-arith", lambda: lar(imgs, next_key()))

    # --- warp as batched take_along_axis --------------------------------
    @jax.jit
    def tala(x, s):
        return jnp.take_along_axis(x, s, axis=1)

    def launch_tala():
        nonlocal src
        src = jnp.bitwise_xor(src, 1)
        return tala(imgs, src)
    timeit("gather-tala", launch_tala)

    # --- warp as vmapped flat take --------------------------------------
    @jax.jit
    def take1(x, s):
        return jax.vmap(lambda im, ss: jnp.take(im, ss))(x, s)

    def launch_take1():
        nonlocal src
        src = jnp.bitwise_xor(src, 2)
        return take1(imgs, src)
    timeit("gather-take1d", launch_take1)

    # --- warp as onehot matmul ------------------------------------------
    @jax.jit
    def wmm(x, s):
        onehot = (s[:, :, None] ==
                  jnp.arange(HW, dtype=jnp.int32)[None, None, :])
        return jnp.einsum("bpq,bq->bp", onehot.astype(jnp.bfloat16),
                          x.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32).astype(jnp.int32)

    def launch_wmm():
        nonlocal src
        src = jnp.bitwise_xor(src, 4)
        return wmm(imgs, src)
    timeit("warp-matmul", launch_wmm)

    # NOTE: an s8 x s8 -> s32 variant of the warp matmul (halving the
    # one-hot HBM traffic) HUNG the remote compiler (>10 min, no result) —
    # int8 dot_general is not usable on this toolchain; bf16 is the floor.

    # --- warp matmul on the (B,HW,C=3) rhs (shared onehot, 3 channels) ---
    x3 = jnp.asarray(rng.integers(0, 256, (B, 3, HW), np.int32))

    @jax.jit
    def wmm3(x, s):
        onehot = (s[:, :, None] ==
                  jnp.arange(HW, dtype=jnp.int32)[None, None, :])
        return jnp.einsum("bpq,bcq->bcp", onehot.astype(jnp.bfloat16),
                          x.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32).astype(jnp.int32)

    def launch_wmm3():
        nonlocal src
        src = jnp.bitwise_xor(src, 16)
        return wmm3(x3, src)
    timeit("warp-matmul-c3", launch_wmm3)

    # --- LUT as onehot matmul -------------------------------------------
    luts = jnp.asarray(rng.integers(0, 256, (B, 256), np.int32))

    @jax.jit
    def lmm(x, t):
        onehot = (x[:, :, None] ==
                  jnp.arange(256, dtype=jnp.int32)[None, None, :])
        return jnp.einsum("bpl,bl->bp", onehot.astype(jnp.bfloat16),
                          t.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32).astype(jnp.int32)

    def launch_lmm():
        nonlocal luts
        luts = jnp.bitwise_xor(luts, 1)
        return lmm(imgs, luts)
    timeit("lut-matmul", launch_lmm)

    # --- histogram in planar layout --------------------------------------
    @jax.jit
    def hist(x):
        onehot = (x[:, :, None] ==
                  jnp.arange(256, dtype=jnp.int32)[None, None, :])
        return jnp.sum(onehot, axis=1, dtype=jnp.int32)

    def launch_hist():
        nonlocal imgs
        imgs = jnp.bitwise_xor(imgs, 1)
        return hist(imgs)
    timeit("histogram-planar", launch_hist)


if __name__ == "__main__":
    main()
