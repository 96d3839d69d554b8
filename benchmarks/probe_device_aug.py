"""TPU probe: stage timings of the on-device augmentation pipeline.

History: the first (vmapped NHWC) implementation of data/device_aug.py
measured 125/245 ms (C=1/C=3) for a strong transform of 1500 images —
the trailing C=1/3 axis is lane-padded to 128 on TPU, so every elementwise
op and HBM byte was wasted 128/42x, and the per-image (H*W, C) warp
gathers were catastrophic.  The rewrite (planar-flat (B, C, H*W) layout,
one-hot-matmul warps, arithmetic LUTs, composed geometric prefix) is what
this probe now measures:

  full-strong      DeviceTransform(dataset, 'strong') end to end
  prefix-warp      composed [rotate]->[flip]->pad+crop resample
  rand-round       one RandAugment round (_round_planar, random draws)
  histogram        _hist_planar (B, C, 256)
  equalize         histogram + PIL step LUT + one-hot-matmul apply
  sharpness        3x3 SMOOTH blend
  cutout           planar rectangle fill

Relay measurement rules: never-seen salted inputs per timed call; the
sync fetches a 1-element slice of the output (np.asarray of the full
(B, H, W, C) output would ship 1.5-4.6 MB through the ~58 MB/s link and
inflate every reading by bytes/8/58MBps — the flaw probe_device_aug3
quantified).  Min of 3 x 8 chained launches.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from graphlearninglayer_tpu.data import device_aug as D

B = 1500
STEPS = 8


def timeit(name, launch, reps=STEPS):
    launch()  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = launch()
        _ = np.asarray(out.reshape(-1)[:1])  # sync w/o fetching the batch
        ts.append((time.perf_counter() - t0) / reps)
    print(f"{name:14s} {min(ts)*1e3:9.2f} ms", flush=True)
    return min(ts)


def run(shape, dataset):
    h, w, c = shape
    hw = h * w
    print(f"\n=== batch ({B}, {h}, {w}, {c})  dataset={dataset} ===")
    rng = np.random.default_rng(time.time_ns())
    imgs = jnp.asarray(rng.integers(0, 256, (B, h, w, c), np.uint8))
    planar = jnp.asarray(rng.integers(0, 256, (B, c, hw), np.int32))
    kbox = [jax.random.PRNGKey(int(rng.integers(1 << 30)))]

    def nk():
        kbox[0] = jax.random.fold_in(kbox[0], 1)
        return kbox[0]

    # full strong transform
    tf = D.DeviceTransform(dataset, "strong")

    @jax.jit
    def full(x, k):
        return tf(x, k)

    timeit("full-strong", lambda: full(imgs, nk()))

    # geometric prefix as one warp
    @jax.jit
    def prefix(x, k):
        k1, k2, k3 = jax.random.split(k, 3)
        ang = (jax.random.uniform(k1, (B,)) * 2 - 1) * 20
        do_flip = jax.random.uniform(k2, (B,)) < 0.5
        off = jax.random.randint(k3, (B, 2), 0, 9)
        src, valid = D._prefix_src(h, w, B, ang, do_flip, off,
                                   rotation=tf.rotation, flip=tf.flip,
                                   pad=4, pad_reflect=tf.pad_reflect)
        return D._warp(x, src, valid)

    timeit("prefix-warp", lambda: prefix(planar, nk()))

    # one RandAugment round
    @jax.jit
    def rr(x, k):
        k1, k2, k3 = jax.random.split(k, 3)
        op = jax.random.randint(k1, (B,), 0, D._NUM_OPS)
        u = jax.random.uniform(k2, (B,), D._ftype())
        lo = jnp.take(jnp.asarray(D._OP_LO), op).astype(D._ftype())
        hi = jnp.take(jnp.asarray(D._OP_HI), op).astype(D._ftype())
        v = u * (hi - lo) + lo
        neg = jax.random.uniform(k3, (B,)) > 0.5
        sv = jnp.where(jnp.take(jnp.asarray(D._OP_SIGNED), op) & neg, -v, v)
        return D._round_planar(x, op, v, sv, h, w)

    timeit("rand-round", lambda: rr(planar & 255, nk()))

    # histogram
    @jax.jit
    def hist(x):
        return D._hist_planar(x)

    def launch_hist():
        nonlocal planar
        planar = jnp.bitwise_xor(planar, 1) & 255
        return hist(planar)
    timeit("histogram", launch_hist)

    # equalize end to end
    @jax.jit
    def eq(x):
        return D._apply_lut_planar(x, D._equalize_lut(D._hist_planar(x), hw))

    def launch_eq():
        nonlocal planar
        planar = jnp.bitwise_xor(planar, 2) & 255
        return eq(planar)
    timeit("equalize", launch_eq)

    # sharpness
    @jax.jit
    def sharp(x, k):
        v = jax.random.uniform(k, (B,), D._ftype()) * 0.9 + 0.05
        return D._sharpness_planar(x, v, h, w)

    timeit("sharpness", lambda: sharp(planar, nk()))

    # cutout
    @jax.jit
    def cut(x, k):
        u = jax.random.uniform(k, (B, 3), D._ftype())
        return D._cutout_planar(x, u[:, 0] * 0.5, u[:, 1], u[:, 2], h, w)

    timeit("cutout", lambda: cut(planar, nk()))


def main():
    run((32, 32, 1), "synthetic")
    run((32, 32, 3), "cifar10")


if __name__ == "__main__":
    main()
