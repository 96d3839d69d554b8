"""TPU probe: where the on-device augmentation time goes.

The --device_data flagship run measured 0.47-0.50 s / 3-step epoch vs
0.23-0.27 s for the host-augment + prefetch path — i.e. the in-jit
augmentation ADDS ~70 ms/step of device compute on top of the ~48 ms
train step, more than the ~93 ms/step wire transfer it removes
(RESULTS.md).  This probe times each stage of data/device_aug.py alone,
as pipelined jitted programs on the augmentation batch shape
(1500 images), to find the offenders:

  full-strong      DeviceTransform(dataset, 'strong') end to end
  pad-crop         vmapped _pad_crop (one coordinate-mapped row gather)
  warp             vmapped _affine_nearest (rotate coeffs)
  rand-round       vmapped _rand_round (one RandAugment draw+apply)
  histogram        vmapped _histogram (onehot reduction, (C,256))
  apply-lut        vmapped _apply_lut (per-pixel 256-entry table lookup)
  sharpness        vmapped _sharpness (3x3 SMOOTH blend)
  cutout           vmapped _cutout

Never-seen salted inputs per timed call + np.asarray sync (relay replay
rules), min of 3 runs of 8 chained launches.
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
        _ = np.asarray(out)
        ts.append((time.perf_counter() - t0) / reps)
    print(f"{name:14s} {min(ts)*1e3:9.2f} ms", flush=True)
    return min(ts)


def run(shape, dataset):
    h, w, c = shape
    print(f"\n=== batch ({B}, {h}, {w}, {c})  dataset={dataset} ===")
    rng = np.random.default_rng(time.time_ns())

    def fresh():
        return jnp.asarray(rng.integers(0, 256, (B, h, w, c), np.uint8))

    imgs = fresh()
    key = jax.random.PRNGKey(int(rng.integers(1 << 30)))

    def salted(outs):
        """fold one output byte into the next input so the relay cannot
        replay; stays uint8."""
        return outs

    # full strong transform
    tf = D.DeviceTransform(dataset, "strong")
    stepk = [key]

    @jax.jit
    def full(x, k):
        return tf(x, k)

    def launch_full():
        stepk[0] = jax.random.fold_in(stepk[0], 1)
        out = full(imgs, stepk[0])
        return out
    timeit("full-strong", launch_full)

    # pad+crop
    @jax.jit
    def padcrop(x, k):
        ij = jax.random.randint(k, (x.shape[0], 2), 0, 9)
        return jax.vmap(lambda im, o: D._pad_crop(
            im.astype(jnp.int32), 4, True, o[0], o[1]))(x, ij)

    def launch_pad():
        stepk[0] = jax.random.fold_in(stepk[0], 2)
        return padcrop(imgs, stepk[0])
    timeit("pad-crop", launch_pad)

    # affine warp (rotate)
    @jax.jit
    def warp(x, k):
        angs = jax.random.uniform(k, (x.shape[0],)) * 30.0

        def one(im, a):
            return D._affine_nearest(im.astype(jnp.int32),
                                     D._rotate_coeffs(h, w, a))
        return jax.vmap(one)(x, angs)

    def launch_warp():
        stepk[0] = jax.random.fold_in(stepk[0], 3)
        return warp(imgs, stepk[0])
    timeit("warp", launch_warp)

    # one RandAugment round
    @jax.jit
    def rr(x, k):
        keys = jax.random.split(k, x.shape[0])
        return jax.vmap(lambda im, kk: D._rand_round(
            im.astype(jnp.int32), kk))(x, keys)

    def launch_rr():
        stepk[0] = jax.random.fold_in(stepk[0], 4)
        return rr(imgs, stepk[0])
    timeit("rand-round", launch_rr)

    # histogram
    @jax.jit
    def hist(x):
        return jax.vmap(lambda im: D._histogram(im.astype(jnp.int32)))(x)

    def launch_hist():
        nonlocal imgs
        imgs = jnp.bitwise_xor(imgs, jnp.uint8(1))
        return hist(imgs)
    timeit("histogram", launch_hist)

    # apply_lut (solarize table — per-image scalar magnitude)
    @jax.jit
    def lut(x, k):
        vs = jax.random.uniform(k, (x.shape[0],)) * 256.0

        def one(im, v):
            return D._apply_lut(im.astype(jnp.int32), D._solarize_lut(v))
        return jax.vmap(one)(x, vs)

    def launch_lut():
        stepk[0] = jax.random.fold_in(stepk[0], 5)
        return lut(imgs, stepk[0])
    timeit("apply-lut", launch_lut)

    # sharpness blend
    @jax.jit
    def sharp(x, k):
        vs = jax.random.uniform(k, (x.shape[0],)) * 0.9 + 0.05
        return jax.vmap(lambda im, v: D._sharpness(
            im.astype(jnp.int32), v))(x, vs)

    def launch_sharp():
        stepk[0] = jax.random.fold_in(stepk[0], 6)
        return sharp(imgs, stepk[0])
    timeit("sharpness", launch_sharp)

    # cutout
    @jax.jit
    def cut(x, k):
        u = jax.random.uniform(k, (x.shape[0], 3))
        return jax.vmap(lambda im, r: D._cutout(
            im.astype(jnp.int32), r[0] * 0.5, r[1], r[2]))(x, u)

    def launch_cut():
        stepk[0] = jax.random.fold_in(stepk[0], 7)
        return cut(imgs, stepk[0])
    timeit("cutout", launch_cut)


def main():
    run((32, 32, 1), "synthetic")
    run((32, 32, 3), "cifar10")


if __name__ == "__main__":
    main()
