"""Probe which take_along_axis shapes Mosaic/Pallas-TPU actually compiles.

Each case is one tiny pallas_call; failures are caught and reported.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_case(name, m, n, axis):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, m if axis == 0 else n,
                                   (m, n), dtype=np.int32))

    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=axis)

    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)
        out = np.asarray(jax.block_until_ready(out))
        want = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=axis)
        err = float(np.max(np.abs(out - want)))
        print(f"{name}: OK  max|err|={err:.1e}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:120]}", flush=True)
        return False


def main():
    try_case("sublane gather ( 256,128) axis0", 256, 128, 0)
    try_case("sublane gather (8192,128) axis0", 8192, 128, 0)
    try_case("lane    gather (128, 128) axis1", 128, 128, 1)
    try_case("lane    gather (128,1024) axis1", 128, 1024, 1)
    try_case("lane    gather (  8,8192) axis1", 8, 8192, 1)
    try_case("sublane gather (65536,128) axis0", 65536, 128, 0)


if __name__ == "__main__":
    main()
