"""TPU probe: device time vs relay round-trip in the flagship train step.

The fullysup driver measures BT ~0.45 s/step for ResNet-18 + GLL at the
reference shape (1250+250, 32x32x3) in BOTH f32 and bf16 — so the step is
not FLOPs-bound.  This isolates where the time goes:

  * per-step sync  — float(loss) each step (what the driver does)
  * pipelined      — dispatch N steps back-to-back, one sync at the end
                     (amortizes the relay round-trip; what the device
                     actually costs)

and both for f32 vs bf16 encoders.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from graphlearninglayer_tpu.models.buildnet import BuildNet
from graphlearninglayer_tpu.train.trainer import (create_train_state,
                                                  make_gl_train_step)


def main():
    n_base, n_batch, l = 250, 1250, 10
    steps = 8
    rng = np.random.default_rng(time.time_ns())

    for dtype_name in ("float32", "bfloat16"):
        model = BuildNet(name="resnet18", head="mlp", feat_dim=128,
                         num_classes=l, dtype=getattr(jnp, dtype_name))
        tx = optax.sgd(0.05, momentum=0.9)
        key = jax.random.PRNGKey(0)
        state = create_train_state(model, tx, key,
                                   jnp.zeros((2, 32, 32, 3), jnp.float32))
        step = make_gl_train_step(model, tx, l, tau=0.07, epsilon="auto",
                                  k=25)

        def batch():
            return (jnp.asarray(rng.normal(size=(n_base, 32, 32, 3))
                                .astype(np.float32)),
                    jnp.asarray(rng.integers(0, l, n_base)),
                    jnp.asarray(rng.normal(size=(n_batch, 32, 32, 3))
                                .astype(np.float32)),
                    jnp.asarray(rng.integers(0, l, n_batch)))

        # compile + warm
        bx, by, ix, iy = batch()
        state, metrics, scores = step(state, bx, by, ix, iy, key)
        _ = np.asarray(metrics["loss"])

        # per-step sync (driver behavior)
        ts = []
        for _ in range(steps):
            bx, by, ix, iy = batch()
            t0 = time.perf_counter()
            state, metrics, scores = step(state, bx, by, ix, iy, key)
            _ = float(np.asarray(metrics["loss"]))
            ts.append(time.perf_counter() - t0)
        print(f"{dtype_name:9s} per-step-sync  "
              f"{min(ts)*1e3:8.1f} ms (median {sorted(ts)[len(ts)//2]*1e3:.1f})",
              flush=True)

        # pipelined
        batches = [batch() for _ in range(steps)]
        t0 = time.perf_counter()
        for bx, by, ix, iy in batches:
            state, metrics, scores = step(state, bx, by, ix, iy, key)
        _ = np.asarray(metrics["loss"])
        dt = (time.perf_counter() - t0) / steps
        print(f"{dtype_name:9s} pipelined      {dt*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
