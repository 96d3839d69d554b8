"""TPU probe: streaming vs device-resident transductive eval.

The fullysup eval (test_gl_transductive: encode base+train+test, one 12k
-node k=50 graph, CG solve) ships the full uint8 train+test splits through
the ~58 MB/s relay link every eval on the streaming path (~36 MB at the
longrun shape -> ~0.6 s of wire per eval, overlapped with encode).  The
--device_data resident path (encode_dataset_resident) sends one row index
per chunk instead.  Measures both, warm, at the longrun_r3 shape
(ResNet-18 bf16, 10k train / 2k test, 250 base, knn 50).

Measured (v5e, warm): per-eval jit wrappers 16-27 s (host re-trace of the
encoder dominated — fixed by lru-caching the step factories in
evalx/harness.py); streaming with cached factories 1.73 s; resident
0.36 s.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from graphlearninglayer_tpu.evalx.harness import test_gl_transductive
from graphlearninglayer_tpu.models.buildnet import BuildNet
from graphlearninglayer_tpu.train.trainer import create_train_state

N_TRAIN, N_TEST, N_BASE, L = 10_000, 2_000, 250, 10
H, W, C = 32, 32, 3


def main():
    rng = np.random.default_rng(time.time_ns())
    model = BuildNet(name="resnet18", head="mlp", feat_dim=128,
                     num_classes=L, dtype=jnp.bfloat16)
    state = create_train_state(model, optax.sgd(0.05),
                               jax.random.PRNGKey(0),
                               jnp.zeros((2, H, W, C), jnp.float32))
    train = rng.integers(0, 256, (N_TRAIN, H, W, C), np.uint8)
    test = rng.integers(0, 256, (N_TEST, H, W, C), np.uint8)
    test_labels = rng.integers(0, L, N_TEST)
    base_sel = rng.permutation(N_TRAIN)[:N_BASE]
    base_labels = rng.integers(0, L, N_BASE)
    norm = ((0.49, 0.48, 0.44), (0.2, 0.2, 0.2))

    common = dict(num_classes=L, train_images=train, knn_num=50,
                  epsilon="auto", tau=1e-8, norm=norm)

    def stream():
        return test_gl_transductive(model, state, train[base_sel],
                                    base_labels, test, test_labels, None,
                                    **common)

    train_dev = jax.device_put(train.reshape(N_TRAIN, -1))
    test_dev = jax.device_put(test.reshape(N_TEST, -1))

    def res():
        return test_gl_transductive(
            model, state, train[base_sel], base_labels, test, test_labels,
            None, resident=(train_dev, test_dev, base_sel, (H, W, C)),
            **common)

    for name, fn in (("streaming", stream), ("resident", res)):
        fn()  # compile + warm
        ts = []
        for _ in range(3):
            # salt the model params so the relay cannot replay a cached
            # (program, input) execution
            state_s = state._replace(params=jax.tree_util.tree_map(
                lambda p: p + 1e-6 * rng.standard_normal(), state.params))
            t0 = time.perf_counter()
            if name == "streaming":
                test_gl_transductive(model, state_s, train[base_sel],
                                     base_labels, test, test_labels, None,
                                     **common)
            else:
                test_gl_transductive(
                    model, state_s, train[base_sel], base_labels, test,
                    test_labels, None,
                    resident=(train_dev, test_dev, base_sel, (H, W, C)),
                    **common)
            ts.append(time.perf_counter() - t0)
        print(f"eval [{name:9s}] warm {min(ts):.3f} s  (runs: "
              + ", ".join(f"{t:.3f}" for t in ts) + ")", flush=True)


if __name__ == "__main__":
    main()
