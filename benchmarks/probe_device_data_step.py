"""TPU probe: flagship driver step on the DEVICE-RESIDENT data path.

The wire-path flagship step (uint8 batch transfer + prefetch + in-producer
device_put) is wall-bound at the measured ~93 ms relay wire floor
(probe_transfer_overlap.py) — compute (46 ms) rides inside it.  The
--device_data path removes the per-step image transfer entirely: the uint8
training set is device-resident, and each step ships only a (1250,) int32
index vector + labels, gathering + augmenting + training inside one jit
(trainer.make_gl_train_step_from_data + data/device_aug.py).

This measures what that buys at the flagship shape (ResNet-18 bf16 + GLL,
base 250 + batch 1250, 32x32x3, k=25):

  * per-step pipelined wall (8 chained steps, one sync) — the honest
    steady-state driver rate
  * with weak vs strong on-device augmentation (strong = 2 RandAugment
    rounds + cutout, the cifar10 default)

Relay rules: fresh index/label vectors per step (never-seen inputs), state
chains through the steps so no (program, input) pair repeats; sync via
np.asarray of a 1-element metric slice.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from graphlearninglayer_tpu.data.device_aug import DeviceTransform
from graphlearninglayer_tpu.models.buildnet import BuildNet
from graphlearninglayer_tpu.train.trainer import (
    create_train_state, make_gl_train_step_from_data)

N_DATA = 50_000  # CIFAR-scale resident set: 50k x 3072 uint8 = 146 MB HBM
N_BASE, N_BATCH, L, K = 250, 1250, 10, 25
H, W, C = 32, 32, 3
STEPS = 8


def main():
    model_name = sys.argv[1] if len(sys.argv) > 1 else "resnet18"
    rng = np.random.default_rng(time.time_ns())
    data = jnp.asarray(rng.integers(0, 256, (N_DATA, H * W * C), np.uint8))

    for mode in ("weak", "strong"):
        aug = DeviceTransform("cifar10", mode)
        norm = (aug.mean, aug.std)
        model = BuildNet(name=model_name, head="mlp", feat_dim=128,
                         num_classes=L, dtype=jnp.bfloat16)
        tx = optax.sgd(0.05, momentum=0.9)
        key = jax.random.PRNGKey(0)
        state = create_train_state(model, tx, key,
                                   jnp.zeros((2, H, W, C), jnp.float32))
        step = make_gl_train_step_from_data(
            model, tx, L, (H, W, C), tau=0.07, epsilon="auto", k=K,
            norm=norm, aug=aug, grad_warn=None)

        def feed():
            rows = rng.permutation(N_DATA)
            return (jnp.asarray(rows[:N_BASE]),
                    jnp.asarray(rng.integers(0, L, N_BASE)),
                    jnp.asarray(rows[N_BASE:N_BASE + N_BATCH]),
                    jnp.asarray(rng.integers(0, L, N_BATCH)))

        bi, by, ii, iy = feed()
        state, metrics, scores = step(state, data, bi, by, ii, iy, key)
        _ = np.asarray(metrics["loss"])  # compile + warm + sync

        ts = []
        for _ in range(3):
            feeds = [feed() for _ in range(STEPS)]
            t0 = time.perf_counter()
            for bi, by, ii, iy in feeds:
                state, metrics, scores = step(state, data, bi, by, ii, iy,
                                              key)
            _ = np.asarray(metrics["loss"])
            ts.append((time.perf_counter() - t0) / STEPS)
        print(f"device-data step [{model_name} {mode:6s}] pipelined "
              f"{min(ts)*1e3:7.1f} ms/step  (runs: "
              + ", ".join(f"{t*1e3:.1f}" for t in ts) + ")", flush=True)


if __name__ == "__main__":
    main()
