"""Attack the flagship step's encoder residue: WHERE does stage1's
17.9 ms marginal go, and what would a stem repack buy?

Parts:
  1. FLOP audit — exact conv FLOPs of the CIFAR ResNet-18 at the flagship
     shape (the earlier 28%-MFU figure undercounted ~2x by counting MACs).
  2. Isolated stage1 conv: fwd / input-grad (dgrad) / filter-grad (wgrad)
     each as its own pipelined program, same for a stage2-shaped conv —
     locates the inefficiency (64 output channels = half the 128-wide MXU
     lane dim; wgrad reduces a 1.5M-deep contraction into a tiny 576x64
     output).
  3. Space-to-depth stem repack (32x32x3 -> 16x16x12 patchify + widened
     stem conv, stage1 running at 16x16x128): NOT numerically equivalent
     to the reference net (different receptive field) — measures the
     headroom a model-variant would buy, reference shape end to end.
  4. Exact-equivalent packed stem (3x3 s1 conv == 2x2 conv on s2d input
     with 4-packed output channels + depth-to-space): same FLOPs, fatter
     contraction/lane dims; checks whether layout alone helps the stem.

Usage: python benchmarks/probe_stage1_variants.py   (TPU)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

N = 1500
STEPS = 8
PEAK = 197e12  # v5e bf16


def timeit(name, launch, sync, reps=STEPS, flops=None):
    sync(launch())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = launch()
        sync(out)
        ts.append((time.perf_counter() - t0) / reps)
    t = min(ts)
    extra = ""
    if flops:
        extra = f"  {flops / t / 1e12:6.1f} TF/s = {flops / t / PEAK:5.1%} MFU"
    print(f"{name:34s} {t*1e3:8.2f} ms{extra}", flush=True)
    return t


def conv_flops(b, hw, cin, cout, k=3):
    return 2 * b * hw * hw * cout * k * k * cin


def flop_audit():
    total = conv_flops(N, 32, 3, 64)
    total += 4 * conv_flops(N, 32, 64, 64)
    for s, (cin, cout, hw) in enumerate(((64, 128, 16), (128, 256, 8),
                                         (256, 512, 4))):
        total += conv_flops(N, hw, cin, cout)          # strided conv1
        total += conv_flops(N, hw, cin, cout, k=1)     # shortcut
        total += 3 * conv_flops(N, hw, cout, cout)
    print(f"ResNet-18 CIFAR fwd conv FLOPs @ B={N}: {total/1e12:.2f} TFLOP "
          f"(fwd+bwd ~3x = {3*total/1e12:.2f} TFLOP)")
    return total


def conv_variants():
    rng = np.random.default_rng(time.time_ns())

    def probe_conv(tag, hw, cin, cout):
        x = jnp.asarray(rng.normal(size=(N, hw, hw, cin)),
                        jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05,
                        jnp.bfloat16)
        g = jnp.asarray(rng.normal(size=(N, hw, hw, cout)), jnp.bfloat16)
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))

        def conv(xx, ww):
            return jax.lax.conv_general_dilated(xx, ww, (1, 1), "SAME",
                                                dimension_numbers=dn)

        fl = conv_flops(N, hw, cin, cout)
        fwd = jax.jit(conv)
        dgrad = jax.jit(jax.grad(lambda xx, ww: jnp.sum(
            conv(xx, ww).astype(jnp.float32) * g.astype(jnp.float32)),
            argnums=0))
        wgrad = jax.jit(jax.grad(lambda xx, ww: jnp.sum(
            conv(xx, ww).astype(jnp.float32) * g.astype(jnp.float32)),
            argnums=1))

        state = {"x": x}

        def mk(f):
            def launch():
                out = f(state["x"], w)
                state["x"] = state["x"] + out.reshape(-1)[0].astype(
                    jnp.bfloat16) * jnp.bfloat16(1e-6) \
                    if out.shape == state["x"].shape else \
                    state["x"] + jnp.bfloat16(1e-6)
                return out
            return launch

        timeit(f"{tag} fwd", mk(fwd), lambda o: np.asarray(o[0, 0, 0, 0]
               if o.ndim == 4 else o.reshape(-1)[0]), flops=fl)
        timeit(f"{tag} dgrad", mk(dgrad), lambda o: np.asarray(
            o.reshape(-1)[0]), flops=fl)
        timeit(f"{tag} wgrad", mk(wgrad), lambda o: np.asarray(
            o.reshape(-1)[0]), flops=fl)

    probe_conv("stage1 conv 64ch@32x32", 32, 64, 64)
    probe_conv("stage2 conv 128ch@16x16", 16, 128, 128)
    probe_conv("packed 256ch@16x16", 16, 256, 256)


class PatchifyResNet(nn.Module):
    """ResNet-18 with a space-to-depth patchify stem: 32x32x3 -> 16x16x12,
    stem conv to 128, stages (128, 128, 256, 512) at (16, 16, 8, 4).
    NOT reference-equivalent — headroom probe only."""
    dtype: any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        from graphlearninglayer_tpu.models.resnet import BasicBlock

        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(
            0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        out = nn.Conv(128, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype)(x.astype(self.dtype))
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype)(out)
        out = nn.relu(out)
        for stage, planes in enumerate((128, 128, 256, 512)):
            for i in range(2):
                stride = 2 if (stage > 1 and i == 0) else 1
                out = BasicBlock(planes, stride, dtype=self.dtype)(out,
                                                                   train)
        return jnp.mean(out.astype(jnp.float32), axis=(1, 2))


def full_model(name, model, d_out=512):
    rng = np.random.default_rng(time.time_ns())
    x = jnp.asarray(rng.normal(size=(N, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, 32, 32, 3), jnp.float32),
                           train=False)
    params, stats = variables["params"], variables.get("batch_stats", {})
    g = jnp.asarray(rng.normal(size=(N, d_out)), jnp.float32)

    def loss(p, xx):
        out, _ = model.apply({"params": p, "batch_stats": stats}, xx,
                             train=True, mutable=["batch_stats"])
        return jnp.sum(out * g)

    fb = jax.jit(jax.grad(loss))
    state = {"x": x}

    def launch():
        gr = fb(params, state["x"])
        leaf = jax.tree_util.tree_leaves(gr)[0]
        state["x"] = state["x"] + leaf.reshape(-1)[0] * 1e-6
        return leaf

    timeit(f"{name} fwd+bwd", launch, lambda o: np.asarray(o))


def main():
    flop_audit()
    conv_variants()
    from benchmarks.probe_encoder_stages import Prefix
    full_model("baseline resnet18", Prefix(n_stages=4))
    full_model("patchify-s2d resnet18", PatchifyResNet())


if __name__ == "__main__":
    main()
