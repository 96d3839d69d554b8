"""TPU probe: component breakdown of the flagship bf16 train step.

VERDICT r1 item 1: the bf16 device step measured ~135 ms at the reference
shape (ResNet-18 + GLL, 250 base + 1250 batch, 32x32x3) while the ResNet-18
fwd+bwd FLOPs (~2.5 TFLOP) cost ~13 ms at v5e bf16 peak — ~10% MFU with no
recorded breakdown.  This probe times each component as its own pipelined
jitted program (salted never-seen inputs; np.asarray sync; min-of-N):

  dispatch-floor   trivial jitted program, chained     (relay/launch floor)
  encode-fwd       encoder forward only
  encode-fwd-bwd   encoder fwd + bwd + SGD update (loss = <feat, g>)
  head-fwd         graph head forward on (1500, 128) features
  head-fwd-bwd     graph head fwd + input-gradient bwd
  chol             dense Cholesky factor+solve at m=1250 (the op's solver)
  full-step        the production make_gl_train_step
  full-nohead      same step with the graph head replaced by a linear loss

Every timing dispatches ``steps`` iterations back-to-back with a data
dependency and syncs once, so the relay round-trip is amortized; the
dispatch floor is measured separately and reported for subtraction.
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
from graphlearninglayer_tpu.ops import laplace_learning
from graphlearninglayer_tpu.ops.solve import cholesky_factor
from graphlearninglayer_tpu.train.losses import custom_ce_loss
from graphlearninglayer_tpu.train.trainer import (_apply, create_train_state,
                                                  make_gl_train_step)

N_BASE, N_BATCH, L, K = 250, 1250, 10, 25
N = N_BASE + N_BATCH
STEPS = 8


def timeit(name, launch, sync, reps=STEPS):
    # warm/compile
    sync(launch())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = launch()
        sync(out)
        ts.append((time.perf_counter() - t0) / reps)
    print(f"{name:16s} {min(ts)*1e3:9.2f} ms", flush=True)
    return min(ts)


def main():
    rng = np.random.default_rng(time.time_ns())
    model = BuildNet(name="resnet18", head="mlp", feat_dim=128,
                     num_classes=L, dtype=jnp.bfloat16)
    tx = optax.sgd(0.05, momentum=0.9)
    key = jax.random.PRNGKey(0)
    state = create_train_state(model, tx, key,
                               jnp.zeros((2, 32, 32, 3), jnp.float32))

    def salt(shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32))

    # --- dispatch floor ---------------------------------------------------
    @jax.jit
    def triv(x):
        return x * 1.000001 + 0.5

    xf = salt((256,))
    def launch_triv():
        nonlocal xf
        xf = triv(xf)
        return xf
    t_floor = timeit("dispatch-floor", launch_triv, lambda o: np.asarray(o))

    # --- encoder forward ----------------------------------------------------
    @jax.jit
    def enc_fwd(params, batch_stats, x):
        (pred, feats), _ = _apply(model, params, batch_stats, x, train=True,
                                  rng=key)
        return feats

    ximg = salt((N, 32, 32, 3))
    def launch_encf():
        nonlocal ximg
        f = enc_fwd(state.params, state.batch_stats, ximg)
        # data-dependency salt so the relay cannot replay a cached result
        ximg = ximg + f[0, 0] * 1e-6
        return f
    timeit("encode-fwd", launch_encf, lambda o: np.asarray(o))

    # --- encoder fwd+bwd + update -------------------------------------------
    gproj = salt((N, 128))

    @jax.jit
    def enc_fb(params, opt_state, batch_stats, x):
        def loss_fn(p):
            (pred, feats), new_stats = _apply(model, p, batch_stats, x,
                                              train=True, rng=key)
            return jnp.sum(feats * gproj), feats

        (loss, feats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, feats

    p_cur, o_cur = state.params, state.opt_state
    def launch_encfb():
        nonlocal p_cur, o_cur, ximg
        p_cur, o_cur, f = enc_fb(p_cur, o_cur, state.batch_stats, ximg)
        ximg = ximg + f[0, 0] * 1e-6
        return f
    timeit("encode-fwd-bwd", launch_encfb, lambda o: np.asarray(o))

    # --- graph head alone -----------------------------------------------
    ylab = jnp.asarray(np.eye(L, dtype=np.float32)[
        rng.integers(0, L, N_BASE)])
    labels = jnp.asarray(rng.integers(0, L, N_BATCH))

    @jax.jit
    def head_fwd(feats):
        f = feats / jnp.linalg.norm(feats, axis=1, keepdims=True)
        return laplace_learning(f, ylab, tau=0.07, epsilon="auto", k=K)

    fx = salt((N, 128))
    def launch_hf():
        nonlocal fx
        p = head_fwd(fx)
        fx = fx + p[0, 0] * 1e-6
        return p
    timeit("head-fwd", launch_hf, lambda o: np.asarray(o))

    @jax.jit
    def head_fb(feats):
        def loss_fn(f):
            fn = f / jnp.linalg.norm(f, axis=1, keepdims=True)
            pred = laplace_learning(fn, ylab, tau=0.07, epsilon="auto", k=K)
            return custom_ce_loss(pred, labels)
        return jax.grad(loss_fn)(feats)

    def launch_hfb():
        nonlocal fx
        g = head_fb(fx)
        fx = fx + g[0, 0] * 1e-6
        return g
    timeit("head-fwd-bwd", launch_hfb, lambda o: np.asarray(o))

    # --- Cholesky factor+solve at m=1250 ---------------------------------
    a_seed = salt((N_BATCH, N_BATCH))

    @jax.jit
    def chol(a_raw, b):
        a = a_raw @ a_raw.T + N_BATCH * jnp.eye(N_BATCH, dtype=a_raw.dtype)
        f = cholesky_factor(a)
        return f.solve(b)

    bmat = salt((N_BATCH, L))
    def launch_chol():
        nonlocal bmat
        z = chol(a_seed, bmat)
        bmat = bmat + z * 1e-6
        return z
    timeit("chol-1250", launch_chol, lambda o: np.asarray(o))

    # --- full production step --------------------------------------------
    step = make_gl_train_step(model, tx, L, tau=0.07, epsilon="auto", k=K,
                              norm=([0.49, 0.48, 0.44], [0.24, 0.24, 0.26]))
    bx = jnp.asarray(rng.integers(0, 256, (N_BASE, 32, 32, 3), np.uint8))
    by = jnp.asarray(rng.integers(0, L, N_BASE))
    ix = jnp.asarray(rng.integers(0, 256, (N_BATCH, 32, 32, 3), np.uint8))
    st_cur = state
    def launch_full():
        nonlocal st_cur
        st, metrics, scores = step(st_cur, bx, by, ix, labels, key)
        st_cur = st
        return metrics["loss"]
    timeit("full-step", launch_full, lambda o: np.asarray(o))

    # --- full step, graph head swapped for a linear loss ------------------
    @jax.jit
    def step_nohead(state_in, ximgs, lbl):
        def loss_fn(p):
            (pred, feats), new_stats = _apply(model, p, state_in.batch_stats,
                                              ximgs, train=True, rng=key)
            return custom_ce_loss(pred, lbl), new_stats
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state_in.params)
        updates, opt_state = tx.update(grads, state_in.opt_state,
                                       state_in.params)
        params = optax.apply_updates(state_in.params, updates)
        return state_in._replace(params=params, opt_state=opt_state,
                                 batch_stats=new_stats), loss

    lbl_all = jnp.asarray(rng.integers(0, L, N))
    st2 = state
    def launch_nohead():
        nonlocal st2, ximg
        st2, loss = step_nohead(st2, ximg, lbl_all)
        ximg = ximg + loss * 1e-8
        return loss
    timeit("full-nohead", launch_nohead, lambda o: np.asarray(o))

    print(f"\ndispatch floor to subtract: {t_floor*1e3:.2f} ms/launch")


if __name__ == "__main__":
    main()
