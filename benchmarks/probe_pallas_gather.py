"""Probe: Pallas TPU dynamic_gather feasibility for the SpMM inner loop.

The Mosaic gather lowering (jax 0.9) supports take_along_axis-style gathers
where indices.shape == operand.shape, along axis 0 (sublanes) or axis 1
(lanes).  For the symmetric-ELL matvec we want, per slot s:
    acc[c, i] += val[s, i] * x[c, nbr[s, i]]
i.e. a LANE gather from a VMEM-resident transposed table x_t (C, n), with
the index row broadcast across sublanes (free).  This probe checks:
  A. does a lane gather over a wide (C, n) table compile and run?
  B. how fast per gathered element vs. the XLA matvec baseline?
  C. does a (n, C) sublane-gather orientation work/compare?
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_lane_gather(n, s_total, sub=128, block_s=8):
    """x_t (sub, n) resident; per step gather block_s index rows, each
    broadcast over sub sublanes; accumulate into (sub, n)."""

    def kernel(idx_ref, val_ref, x_ref, acc_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        for j in range(block_s):  # static unroll over slot rows in block
            idx = idx_ref[j, :][None, :]                   # (1, n)
            idx_b = jnp.broadcast_to(idx, (sub, n))
            g = jnp.take_along_axis(x_ref[:], idx_b, axis=1)
            acc_ref[:] += val_ref[j, :][None, :] * g

    @jax.jit
    def run(idx, val, x_t):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((sub, n), jnp.float32),
            grid=(s_total // block_s,),
            in_specs=[
                pl.BlockSpec((block_s, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_s, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((sub, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((sub, n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
        )(idx, val, x_t)

    return run


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    s_total = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    sub = 128

    rng = np.random.default_rng(0)
    x_t = jnp.asarray(rng.normal(size=(sub, n)).astype(np.float32))
    idxs = [jnp.asarray(rng.integers(0, n, (s_total, n), dtype=np.int32))
            for _ in range(4)]
    val = jnp.asarray(rng.normal(size=(s_total, n)).astype(np.float32))

    run = make_lane_gather(n, s_total, sub=sub)
    try:
        out = jax.block_until_ready(run(idxs[0], val, x_t))
        # correctness against numpy
        want = np.zeros((sub, n), np.float32)
        xnp, inp, vnp = (np.asarray(x_t), np.asarray(idxs[0]),
                         np.asarray(val))
        for s in range(s_total):
            want += vnp[s][None, :] * xnp[:, inp[s]]
        err = float(np.max(np.abs(np.asarray(out) - want)))
        print(f"lane-gather correct: max|err| = {err:.2e}", flush=True)

        t0 = time.perf_counter()
        reps = 16
        for i in range(reps):
            out = run(idxs[i % len(idxs)], val, x_t)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        elems = s_total * n
        print(f"lane-gather: {dt*1e3:.3f} ms for {s_total} slots x {n} "
              f"({elems/dt:.3e} gathered-slots/s; x{sub} lanes each)",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"lane-gather FAILED: {type(e).__name__}: {str(e)[:400]}",
              flush=True)


if __name__ == "__main__":
    main()
