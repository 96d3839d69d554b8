"""TPU probe: isolate the fixed overheads seen in probe_device_aug2.

probe_device_aug2 measured ~19 ms for PURE ELEMENTWISE ops on a
(1500, 1024) int32 batch (6 MB) — ~1000x above the arithmetic cost —
while the histogram (256x more work) ran at 7.5 ms.  Suspects:

  ew-chain        x = x+1 elementwise, chained on itself (pure floor)
  ew-fresh-key    same + a host-side fold_in program per launch
  rng-inside      elementwise op that draws jax.random.uniform(B,3) inside
  rng-outside     same op with the uniforms passed as an argument
  where-select    jnp.where select against a broadcast mask (cutout core)
  mulred-lut      LUT apply as broadcast-multiply+reduce (vs einsum 17ms)
  gather-hbm      take_along_axis again for reference

min of 3 x 8 chained launches, np.asarray sync, salted inputs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, HW = 1500, 1024
STEPS = 8


def timeit(name, launch, reps=STEPS):
    launch()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = launch()
        _ = np.asarray(out)
        ts.append((time.perf_counter() - t0) / reps)
    print(f"{name:16s} {min(ts)*1e3:9.2f} ms", flush=True)
    return min(ts)


def main():
    rng = np.random.default_rng(time.time_ns())
    x0 = jnp.asarray(rng.integers(0, 256, (B, HW), np.int32))

    # --- elementwise chained on itself -----------------------------------
    @jax.jit
    def ew(x):
        return (x + 1) & 255

    state = [x0]
    def launch_ew():
        state[0] = ew(state[0])
        return state[0]
    timeit("ew-chain", launch_ew)

    # --- plus a fold_in program per launch --------------------------------
    kbox = [jax.random.PRNGKey(int(rng.integers(1 << 30)))]

    @jax.jit
    def ew2(x, k):
        return (x + jax.random.randint(k, (), 0, 2)) & 255

    def launch_ewk():
        kbox[0] = jax.random.fold_in(kbox[0], 1)
        state[0] = ew2(state[0], kbox[0])
        return state[0]
    timeit("ew-fresh-key", launch_ewk)

    # --- RNG inside the jit ------------------------------------------------
    @jax.jit
    def rin(x, k):
        u = jax.random.uniform(k, (B, 3))
        return (x + u[:, :1].astype(jnp.int32)) & 255

    def launch_rin():
        kbox[0] = jax.random.fold_in(kbox[0], 2)
        state[0] = rin(state[0], kbox[0])
        return state[0]
    timeit("rng-inside", launch_rin)

    # --- RNG outside, passed in ---------------------------------------------
    @jax.jit
    def rout(x, u):
        return (x + u[:, :1].astype(jnp.int32)) & 255

    u_host = jnp.asarray(rng.random((B, 3), np.float32))
    def launch_rout():
        state[0] = rout(state[0], u_host)
        return state[0]
    timeit("rng-outside", launch_rout)

    # --- where-select against broadcast mask --------------------------------
    @jax.jit
    def wsel(x, u):
        w = 32
        v = u[:, 0] * 0.5 * w
        xs = jnp.arange(w, dtype=jnp.float32)
        mx = (xs[None] >= u[:, 1:2] * w) & (xs[None] <= (u[:, 1:2] * w + v[:, None]))
        my = (xs[None] >= u[:, 2:3] * w) & (xs[None] <= (u[:, 2:3] * w + v[:, None]))
        mask = (my[:, :, None] & mx[:, None, :]).reshape(B, HW)
        return jnp.where(mask, 125, x)

    def launch_wsel():
        state[0] = wsel(state[0], u_host)
        return state[0]
    timeit("where-select", launch_wsel)

    # --- LUT apply via broadcast-multiply + reduce ----------------------------
    luts = jnp.asarray(rng.integers(0, 256, (B, 256), np.int32))

    @jax.jit
    def mulred(x, t):
        onehot = (x[:, :, None] == jnp.arange(256, dtype=jnp.int32))
        return jnp.sum(onehot * t[:, None, :], axis=-1, dtype=jnp.int32)

    def launch_mr():
        state[0] = mulred(state[0] & 255, luts)
        return state[0]
    timeit("mulred-lut", launch_mr)

    # --- gather reference ------------------------------------------------------
    src = jnp.asarray(rng.integers(0, HW, (B, HW), np.int32))

    @jax.jit
    def tala(x, s):
        return jnp.take_along_axis(x, s, axis=1)

    def launch_tala():
        state[0] = tala(state[0], src)
        return state[0]
    timeit("gather-hbm", launch_tala)


if __name__ == "__main__":
    main()
