"""miniimagenet (84x84x3) device-aug path on the real chip.

The 84x84 image size exceeds the one-hot-matmul pixel gate
(_MATMUL_MAX_PIXELS = 2048 < 84*84 = 7056), so the warp and equalize-LUT
ops take their gather fallbacks (data/device_aug.py:295-305,180-188).
Round 2's advisor worried those fallbacks would OOM or crawl at the
flagship batch size; they are CPU-tested but were never measured on the
TPU.  This probe times one full strong-aug DeviceTransform call (and the
gather+aug+normalize prefix of a training step) at the flagship batch
(1250 + 250 base = 1500 images) on device.

Run (TPU):  python benchmarks/probe_miniimagenet_aug.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from graphlearninglayer_tpu.data import DeviceTransform

B, H, W, C = 1500, 84, 84, 3


def main():
    rng = np.random.default_rng(0)
    aug = DeviceTransform("miniimagenet", "strong")

    @jax.jit
    def aug_batch(batch, key):
        return aug(batch, key)

    batch0 = jnp.asarray(rng.integers(0, 256, (B, H, W, C), np.uint8))
    t0 = time.time()
    np.asarray(aug_batch(batch0, jax.random.PRNGKey(0)))
    print(f"compile+first run: {time.time() - t0:.2f}s", flush=True)

    # salted, never-seen inputs per timed call, generated ON DEVICE so the
    # ~55 MB/s relay wire stays out of the timed region (relay rules,
    # CLAUDE.md)
    iters = 10
    seed0 = int(time.time_ns() % 2**31)

    @jax.jit
    def gen(seed):
        return jax.random.randint(jax.random.PRNGKey(seed), (B, H, W, C),
                                  0, 256, jnp.int32).astype(jnp.uint8)

    batches = [jax.block_until_ready(gen(seed0 + i)) for i in range(iters)]
    keys = [jax.random.PRNGKey(seed0 + 7919 * i) for i in range(iters)]
    t0 = time.time()
    outs = [aug_batch(b, k) for b, k in zip(batches, keys)]
    for o in outs:
        np.asarray(o[:1])
    dt = (time.time() - t0) / iters
    mem = jax.devices()[0].memory_stats()
    peak = mem.get("peak_bytes_in_use", 0) / 2**30 if mem else float("nan")
    print(f"strong aug {B}x{H}x{W}x{C}: {dt*1e3:.1f} ms/batch "
          f"({B/dt:.0f} img/s), device peak {peak:.2f} GiB", flush=True)


if __name__ == "__main__":
    main()
