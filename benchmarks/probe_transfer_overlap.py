"""TPU probe: can host->device transfers overlap device compute through the
relay?

The flagship driver step is ~48 ms of device compute plus ~85-120 ms of
uint8 batch transfer (4.6 MB at the ~55 MB/s relay link).  If a transfer
issued from a background thread (or simply issued before the step's result
is consumed) proceeds while the previous step executes, the driver can hide
the wire time behind compute and approach max(transfer, compute) instead of
their sum.

Variants (16 steps each, fresh never-seen uint8 batches, np.asarray sync):
  serial         per step: device_put(batch) then dispatch step
  pre-issued     all device_puts for step t+1 issued right after
                 dispatching step t (same thread, async dispatch)
  bg-thread      a producer thread device_puts batches one ahead
"""
import os
import queue
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from graphlearninglayer_tpu.models.buildnet import BuildNet
from graphlearninglayer_tpu.train.trainer import (create_train_state,
                                                  make_gl_train_step)

N_BASE, N_BATCH, L, K = 250, 1250, 10, 25
STEPS = 16


def main():
    rng = np.random.default_rng(time.time_ns())
    model = BuildNet(name="resnet18", head="mlp", feat_dim=128,
                     num_classes=L, dtype=jnp.bfloat16)
    tx = optax.sgd(0.05, momentum=0.9)
    key = jax.random.PRNGKey(0)
    state0 = create_train_state(model, tx, key,
                                jnp.zeros((2, 32, 32, 3), jnp.float32))
    step = make_gl_train_step(model, tx, L, tau=0.07, epsilon="auto", k=K,
                              norm=([0.49, 0.48, 0.44], [0.24, 0.24, 0.26]))
    by = jnp.asarray(rng.integers(0, L, N_BASE))
    labels = jnp.asarray(rng.integers(0, L, N_BATCH))

    def fresh_batches(n):
        return [(rng.integers(0, 256, (N_BASE, 32, 32, 3), np.uint8),
                 rng.integers(0, 256, (N_BATCH, 32, 32, 3), np.uint8))
                for _ in range(n)]

    # warm/compile once
    st = state0
    bx0, ix0 = fresh_batches(1)[0]
    st, metrics, _ = step(st, jnp.asarray(bx0), by, jnp.asarray(ix0), labels,
                          key)
    np.asarray(metrics["loss"])

    def run_serial():
        nonlocal st
        batches = fresh_batches(STEPS)
        t0 = time.perf_counter()
        m = None
        for bx, ix in batches:
            st, m, _ = step(st, jnp.asarray(bx), by, jnp.asarray(ix), labels,
                            key)
        np.asarray(m["loss"])
        return (time.perf_counter() - t0) / STEPS

    def run_preissued():
        nonlocal st
        batches = fresh_batches(STEPS)
        dev = [jax.device_put(a) for a in batches[0]]
        t0 = time.perf_counter()
        m = None
        for i in range(STEPS):
            bx_d, ix_d = dev
            st, m, _ = step(st, bx_d, by, ix_d, labels, key)
            if i + 1 < STEPS:
                dev = [jax.device_put(a) for a in batches[i + 1]]
        np.asarray(m["loss"])
        return (time.perf_counter() - t0) / STEPS

    def run_bg_thread():
        nonlocal st
        batches = fresh_batches(STEPS)
        q: queue.Queue = queue.Queue(maxsize=1)

        def produce():
            for bx, ix in batches:
                q.put((jax.device_put(bx), jax.device_put(ix)))

        t = threading.Thread(target=produce, daemon=True)
        t0 = time.perf_counter()
        t.start()
        m = None
        for _ in range(STEPS):
            bx_d, ix_d = q.get()
            st, m, _ = step(st, bx_d, by, ix_d, labels, key)
        np.asarray(m["loss"])
        return (time.perf_counter() - t0) / STEPS

    for name, fn in [("serial", run_serial), ("pre-issued", run_preissued),
                     ("bg-thread", run_bg_thread)]:
        ts = [fn() for _ in range(2)]
        print(f"{name:12s} {min(ts)*1e3:8.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
