"""TPU probe: per-stage cost of the bf16 ResNet-18 encoder fwd+bwd.

Follow-up to probe_step_breakdown.py, which showed the flagship train step
is ~48 ms on device and ~all of it is the encoder (graph head ~6 ms).  This
probe times cumulative prefixes of the network (stem, stem+stage1, ...) for
forward and fwd+bwd, each as its own pipelined jitted program, to locate
which stage eats the time and whether any layout is pathological.

Also times two variants of the full encoder to test specific hypotheses:
  f32-everything     is bf16 actually winning?
  no-BN              how much do the BatchNorms cost (bandwidth-bound
                     elementwise + f32 stats converts)?
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from graphlearninglayer_tpu.models.resnet import BasicBlock

N = 1500
STEPS = 8


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
    print(f"{name:22s} {min(ts)*1e3:9.2f} ms", flush=True)
    return min(ts)


class Prefix(nn.Module):
    """First ``n_stages`` stages of the CIFAR ResNet-18 (0 = stem only)."""
    n_stages: int
    dtype: any = jnp.bfloat16
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        out = nn.Conv(64, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype)(x)
        if self.use_bn:
            out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, dtype=self.dtype)(out)
        out = nn.relu(out)
        for stage in range(self.n_stages):
            planes = (64, 128, 256, 512)[stage]
            for i in range(2):
                stride = 2 if (stage > 0 and i == 0) else 1
                if self.use_bn:
                    out = BasicBlock(planes, stride, dtype=self.dtype)(
                        out, train)
                else:
                    h = nn.Conv(planes, (3, 3), strides=stride, padding=1,
                                use_bias=False, dtype=self.dtype)(out)
                    h = nn.relu(h)
                    h = nn.Conv(planes, (3, 3), padding=1, use_bias=False,
                                dtype=self.dtype)(h)
                    if stride != 1 or out.shape[-1] != planes:
                        out = nn.Conv(planes, (1, 1), strides=stride,
                                      use_bias=False, dtype=self.dtype)(out)
                    out = nn.relu(h + out)
        return jnp.mean(out.astype(jnp.float32), axis=(1, 2))


def time_model(name, model):
    rng = np.random.default_rng(time.time_ns())
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.normal(size=(N, 32, 32, 3)).astype(np.float32))
    variables = model.init(key, jnp.zeros((2, 32, 32, 3), jnp.float32),
                           train=False)
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def apply_fwd(p, xx):
        vs = {"params": p}
        if stats:
            vs["batch_stats"] = stats
            out, _ = model.apply(vs, xx, train=True, mutable=["batch_stats"])
            return out
        return model.apply(vs, xx, train=True)

    fwd = jax.jit(lambda p, xx: apply_fwd(p, xx))

    def launch_f():
        nonlocal x
        f = fwd(params, x)
        x = x + f[0, 0] * 1e-6
        return f
    tf = timeit(f"{name} fwd", launch_f, lambda o: np.asarray(o))

    d_out = model.apply(variables, jnp.zeros((2, 32, 32, 3)),
                        train=False).shape[-1]
    g = jnp.asarray(rng.normal(size=(N, d_out)).astype(np.float32))

    fb = jax.jit(jax.grad(lambda p, xx: jnp.sum(apply_fwd(p, xx) * g)))

    def launch_fb():
        nonlocal x
        gr = fb(params, x)
        leaf = jax.tree_util.tree_leaves(gr)[0]
        x = x + leaf.reshape(-1)[0] * 1e-6
        return leaf
    tb = timeit(f"{name} fwd+bwd", launch_fb, lambda o: np.asarray(o))
    return tf, tb


def main():
    prev_f = prev_b = 0.0
    for ns in range(5):
        label = "stem" if ns == 0 else f"..stage{ns}"
        tf, tb = time_model(label, Prefix(n_stages=ns))
        print(f"  {'':20s} marginal fwd {1e3*(tf-prev_f):7.2f} ms   "
              f"fwd+bwd {1e3*(tb-prev_b):7.2f} ms", flush=True)
        prev_f, prev_b = tf, tb
    time_model("full-f32", Prefix(n_stages=4, dtype=jnp.float32))
    time_model("full-noBN", Prefix(n_stages=4, use_bn=False))


if __name__ == "__main__":
    main()
