"""TPU probe: which in-kernel selection primitives does Mosaic compile?

Tests, on small shapes, inside a Pallas TPU kernel:
  1. jnp.sort along the lane dim
  2. jax.lax.top_k
  3. a hand-rolled bitonic compare-exchange pass (reshape + flip + min/max)
  4. @pl.when gating on a reduced scalar

Each case prints COMPILED+CORRECT / COMPILED+WRONG / FAILED <err>.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q, M = 256, 512


def run(name, kernel, check):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Q, M), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        x = jnp.asarray(np.random.default_rng(0)
                        .normal(size=(Q, M)).astype(np.float32))
        out = np.asarray(jax.jit(f)(x))
        ok = check(np.asarray(x), out)
        print(f"{name:24s} COMPILED+{'CORRECT' if ok else 'WRONG'}",
              flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"{name:24s} FAILED {type(e).__name__}: {msg}", flush=True)


def k_sort(x_ref, o_ref):
    o_ref[:] = jnp.sort(x_ref[:], axis=-1)


def k_topk(x_ref, o_ref):
    v, _ = jax.lax.top_k(x_ref[:], M)
    o_ref[:] = v


def bitonic_pass(x, k, j):
    # one compare-exchange stage: partner = index XOR j, via reshape +
    # static-slice swap (jnp.flip lowers to the unsupported `rev`)
    q, m = x.shape
    y = x.reshape(q, m // (2 * j), 2, j)
    p = jnp.concatenate([y[:, :, 1:2, :], y[:, :, 0:1, :]], axis=2)
    lane = jax.lax.broadcasted_iota(jnp.int32, (q, m), 1)
    up = (lane & k) == 0                         # ascending block?
    lo = jnp.minimum(y, p).reshape(q, m)
    hi = jnp.maximum(y, p).reshape(q, m)
    first = (lane & j) == 0                      # first element of the pair
    keep_lo = first == up
    return jnp.where(keep_lo, lo, hi)


def k_bitonic(x_ref, o_ref):
    x = x_ref[:]
    k = 2
    while k <= M:
        j = k // 2
        while j >= 1:
            x = bitonic_pass(x, k, j)
            j //= 2
        k *= 2
    o_ref[:] = x


def bitonic_pass_roll(x, k, j, roll):
    q, m = x.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (q, m), 1)
    first = (lane & j) == 0
    p = jnp.where(first, roll(x, -j), roll(x, j))   # partner = lane XOR j
    up = (lane & k) == 0
    lo = jnp.minimum(x, p)
    hi = jnp.maximum(x, p)
    return jnp.where(first == up, lo, hi)


def make_bitonic_roll(roll):
    def kern(x_ref, o_ref):
        x = x_ref[:]
        k = 2
        while k <= M:
            j = k // 2
            while j >= 1:
                x = bitonic_pass_roll(x, k, j, roll)
                j //= 2
            k *= 2
        o_ref[:] = x
    return kern


def k_when(x_ref, o_ref):
    x = x_ref[:]
    o_ref[:] = x
    cond = jnp.max(x) > 0.0                      # reduced scalar

    @pl.when(cond)
    def _():
        o_ref[:] = x * 2.0


def c_sorted(x, out):
    return np.allclose(out, np.sort(x, axis=-1), atol=0)


def c_topk(x, out):
    return np.allclose(out, -np.sort(-x, axis=-1), atol=0)


def c_when(x, out):
    return np.allclose(out, x * 2.0 if x.max() > 0 else x, atol=0)


if __name__ == "__main__":
    only = sys.argv[1] if len(sys.argv) > 1 else None
    cases = [
        ("jnp.sort", k_sort, c_sorted),
        ("lax.top_k(full)", k_topk, c_topk),
        ("bitonic reshape", k_bitonic, c_sorted),
        ("bitonic jnp.roll",
         make_bitonic_roll(lambda x, s: jnp.roll(x, s, axis=1)), c_sorted),
        ("bitonic pltpu.roll",
         make_bitonic_roll(lambda x, s: pltpu.roll(x, s % M, 1)), c_sorted),
        ("pl.when(scalar)", k_when, c_when),
    ]
    for name, kern, chk in cases:
        if only and only not in name:
            continue
        run(name, kern, chk)
