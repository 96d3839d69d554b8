"""Can stage1's 64-channel convs run at full MXU lane width EXACTLY?

probe_stage1_variants.py showed: at the same total FLOPs, the patchify
model (128ch@16x16 shapes) runs the encoder fwd+bwd in 33.8 ms vs 46.0 ms
baseline — stage1's C=64 < 128 lanes pads every activation tile to half
empty.  A semantics-preserving fix candidate: PAIR-PACK two images into
the channel dim ((B, 32, 32, 64) -> (B/2, 32, 32, 128)) and run the conv
with ``feature_group_count=2`` — identical math and FLOPs, full lanes.

Measures (each chained in a lax.fori_loop INSIDE one jit, so the ~3 ms
relay dispatch floor and HBM-resident input reuse don't swamp the signal):
  * stage1 conv as-is, pair-packed grouped conv, and (for scale) the
    stage2-shaped conv;
  * numerics check grouped == unpacked;
  * full stage1 block stack in both layouts, fwd+bwd.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 1500
LOOP = 20
PEAK = 197e12


def timeit(name, launch, sync, flops=None, reps=3):
    sync(launch())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = launch()
        sync(out)
        ts.append((time.perf_counter() - t0) / (reps * LOOP))
    t = min(ts)
    extra = ""
    if flops:
        extra = f"  {flops / t / 1e12:6.1f} TF/s = {flops / t / PEAK:5.1%} MFU"
    print(f"{name:34s} {t*1e3:8.3f} ms/conv{extra}", flush=True)
    return t


def looped(convfn, x0, w):
    """Chain LOOP dependent conv applications inside one jit."""

    @jax.jit
    def run(x, ww):
        def body(_, acc):
            out = convfn(acc, ww)
            return out * jnp.bfloat16(0.999)   # keep magnitudes bounded

        return jax.lax.fori_loop(0, LOOP, body, x)

    return run


def main():
    rng = np.random.default_rng(time.time_ns())
    dn = lambda xs, ws: jax.lax.conv_dimension_numbers(
        xs, ws, ("NHWC", "HWIO", "NHWC"))

    # --- plain 64ch conv, 32x32 ---
    x64 = jnp.asarray(rng.normal(size=(N, 32, 32, 64)) * 0.1, jnp.bfloat16)
    w64 = jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.05, jnp.bfloat16)
    fl = 2 * N * 32 * 32 * 64 * 9 * 64

    def conv_plain(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn(x.shape, w.shape))

    run_plain = looped(conv_plain, x64, w64)
    state = {"x": x64}

    def launch_plain():
        out = run_plain(state["x"], w64)
        state["x"] = out
        return out

    timeit("stage1 conv 64ch@32x32 (looped)", launch_plain,
           lambda o: np.asarray(o[0, 0, 0, 0]), flops=fl)

    # --- pair-packed grouped conv: (N/2, 32, 32, 128), groups=2 ---
    xp = jnp.asarray(np.concatenate(
        [np.asarray(x64[: N // 2]), np.asarray(x64[N // 2:])], axis=-1),
        jnp.bfloat16)
    wp = jnp.concatenate([w64, w64], axis=-1)  # (3,3,64,128): group g uses
    # out-channel block g with in-block g — same weights for both images

    def conv_grouped(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn(x.shape, w.shape),
            feature_group_count=2)

    # numerics: grouped(packed) must equal packing of plain outputs
    got = conv_grouped(xp, wp)
    want_a = conv_plain(x64[: N // 2], w64)
    want_b = conv_plain(x64[N // 2:], w64)
    np.testing.assert_allclose(
        np.asarray(got[..., :64], np.float32),
        np.asarray(want_a, np.float32), rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(
        np.asarray(got[..., 64:], np.float32),
        np.asarray(want_b, np.float32), rtol=5e-2, atol=5e-2)
    print("pair-pack numerics: OK (grouped == plain per image)", flush=True)

    run_grp = looped(conv_grouped, xp, wp)
    state_g = {"x": xp}

    def launch_grp():
        out = run_grp(state_g["x"], wp)
        state_g["x"] = out
        return out

    timeit("pair-packed grouped 128ch@32x32", launch_grp,
           lambda o: np.asarray(o[0, 0, 0, 0]), flops=fl)

    # --- batch-merged control: same machine shape without groups ---
    # (N/2, 32, 32, 128) -> 128 out, dense 128-contraction: 2x the FLOPs
    # of the real op but the pure full-lane layout — the ceiling
    wd = jnp.asarray(rng.normal(size=(3, 3, 128, 128)) * 0.05, jnp.bfloat16)
    run_dense = looped(conv_plain, xp, wd)
    state_d = {"x": xp}

    def launch_dense():
        out = run_dense(state_d["x"], wd)
        state_d["x"] = out
        return out

    timeit("dense 128ch@32x32 (2x FLOPs)", launch_dense,
           lambda o: np.asarray(o[0, 0, 0, 0]), flops=2 * fl)

    # --- stage2 shape control ---
    x2 = jnp.asarray(rng.normal(size=(N, 16, 16, 128)) * 0.1, jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 128, 128)) * 0.05, jnp.bfloat16)
    run2 = looped(conv_plain, x2, w2)
    state2 = {"x": x2}

    def launch2():
        out = run2(state2["x"], w2)
        state2["x"] = out
        return out

    timeit("stage2 conv 128ch@16x16 (looped)", launch2,
           lambda o: np.asarray(o[0, 0, 0, 0]),
           flops=2 * N * 16 * 16 * 128 * 9 * 128)

    # --- fwd+bwd through a LOOP of convs, both layouts ---
    g64 = jnp.asarray(rng.normal(size=(N, 32, 32, 64)), jnp.bfloat16)

    def loss_plain(w, x):
        def body(_, acc):
            return conv_plain(acc, w) * jnp.bfloat16(0.999)
        out = jax.lax.fori_loop(0, LOOP, body, x)
        return jnp.sum(out.astype(jnp.float32) * g64.astype(jnp.float32))

    fb_plain = jax.jit(jax.grad(loss_plain))
    sp = {"x": x64}

    def launch_fbp():
        out = fb_plain(w64, sp["x"])
        sp["x"] = sp["x"] * jnp.bfloat16(0.9999)
        return out

    timeit("64ch loop fwd+bwd", launch_fbp,
           lambda o: np.asarray(o.reshape(-1)[0]), flops=3 * fl)

    gp = jnp.asarray(rng.normal(size=(N // 2, 32, 32, 128)), jnp.bfloat16)

    def loss_grp(w, x):
        def body(_, acc):
            return conv_grouped(acc, w) * jnp.bfloat16(0.999)
        out = jax.lax.fori_loop(0, LOOP, body, x)
        return jnp.sum(out.astype(jnp.float32) * gp.astype(jnp.float32))

    fb_grp = jax.jit(jax.grad(loss_grp))
    sg = {"x": xp}

    def launch_fbg():
        out = fb_grp(wp, sg["x"])
        sg["x"] = sg["x"] * jnp.bfloat16(0.9999)
        return out

    timeit("pair-packed loop fwd+bwd", launch_fbg,
           lambda o: np.asarray(o.reshape(-1)[0]), flops=3 * fl)


if __name__ == "__main__":
    main()
