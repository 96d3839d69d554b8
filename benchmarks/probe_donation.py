"""TPU probe: does donating the TrainState buffers speed the flagship step?

jit(donate_argnums=(0,)) lets XLA alias the params/opt-state outputs onto
the inputs (ResNet-18 + SGD-momentum state is ~90 MB of f32), avoiding the
output allocation + copy.  Measures the production gl step without and
with donation, pipelined (8 chained steps, np.asarray sync, min of 3).
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
from graphlearninglayer_tpu.train.losses import custom_ce_loss
from graphlearninglayer_tpu.train.trainer import (TrainState, _apply,
                                                  _device_normalize,
                                                  create_train_state)
from graphlearninglayer_tpu.ops import laplace_learning

N_BASE, N_BATCH, L, K = 250, 1250, 10, 25
STEPS = 8
NORM = ([0.49, 0.48, 0.44], [0.24, 0.24, 0.26])


def timeit(name, launch, sync, reps=STEPS):
    sync(launch())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = launch()
        sync(out)
        ts.append((time.perf_counter() - t0) / reps)
    print(f"{name:18s} {min(ts)*1e3:9.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(time.time_ns())
    model = BuildNet(name="resnet18", head="mlp", feat_dim=128,
                     num_classes=L, dtype=jnp.bfloat16)
    tx = optax.sgd(0.05, momentum=0.9)
    key = jax.random.PRNGKey(0)
    state0 = create_train_state(model, tx, key,
                                jnp.zeros((2, 32, 32, 3), jnp.float32))

    def step_fn(state, base_images, base_labels, images, labels, rng_):
        x = jnp.concatenate([_device_normalize(base_images, NORM),
                             _device_normalize(images, NORM)], axis=0)
        y = jax.nn.one_hot(base_labels, L, dtype=x.dtype)

        def loss_fn(params):
            (_, features), new_stats = _apply(model, params,
                                              state.batch_stats, x,
                                              train=True, rng=rng_)
            pred = laplace_learning(features, y, tau=0.07, epsilon="auto",
                                    k=K)
            return custom_ce_loss(pred, labels), (pred, new_stats)

        (loss, (pred, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, new_stats, opt_state, state.step + 1), loss

    bx = jnp.asarray(rng.integers(0, 256, (N_BASE, 32, 32, 3), np.uint8))
    by = jnp.asarray(rng.integers(0, L, N_BASE))
    ix = jnp.asarray(rng.integers(0, 256, (N_BATCH, 32, 32, 3), np.uint8))
    labels = jnp.asarray(rng.integers(0, L, N_BATCH))

    for name, jitted in [("no-donation", jax.jit(step_fn)),
                         ("donate-state", jax.jit(step_fn,
                                                  donate_argnums=(0,)))]:
        st = jax.tree_util.tree_map(jnp.copy, state0)
        holder = {"st": st}

        def launch():
            holder["st"], loss = jitted(holder["st"], bx, by, ix, labels,
                                        key)
            return loss
        timeit(name, launch, lambda o: np.asarray(o))


if __name__ == "__main__":
    main()
