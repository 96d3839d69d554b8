"""Carlini–Wagner L2 attack through the graph head.

Port of reference ``test_cw_attack`` (adversarial.py:639-809): optimize a
tanh-space variable w with Adam(lr=0.005) so that
    loss = ||w_tanh - data||^2 / B  +  c * sum(relu(max_c P - P_runnerup)) / B
where the runner-up class is fixed from the *initial* prediction.  The GL
variant uses the graph head's probabilities directly; the MLP variant
exponentiates log-probabilities for a fair comparison (adversarial.py:732-736).

The whole Adam loop runs as one jitted ``lax.fori_loop`` — for the GL head
that is a full KNN-graph build + solve + implicit-diff backward per
iteration, all on device.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..ops import laplace_learning

__all__ = ["make_gl_cw_attack", "make_mlp_cw_attack"]


def _to_tanh_space(data, min_val, max_val):
    return jnp.arctanh(jnp.clip((2.0 / (max_val - min_val)) * (data - min_val)
                                - 1.0, -1 + 1e-6, 1 - 1e-6))


def _from_tanh_space(w, min_val, max_val):
    return 0.5 * (jnp.tanh(w) + 1.0) * (max_val - min_val) + min_val


def _cw_margin(output, idx, next_pred, c, batch):
    loss2 = c * jnp.sum(jnp.maximum(
        jnp.max(output, axis=1) - output[idx, next_pred], 0.0))
    return loss2 / batch


def make_gl_cw_attack(encode: Callable, num_classes: int, tau: float = 0.0,
                      epsilon_graph="auto", k: int = 25,
                      solver: str = "cholesky", cw_lr: float = 0.005,
                      iters: int = 100):
    """CW attack for GL-head models; ``encode(images) -> features``."""

    def gl_output(base_images, base_labels, images):
        x = jnp.concatenate([base_images, images], axis=0)
        feats = encode(x)
        y = jax.nn.one_hot(base_labels, num_classes, dtype=feats.dtype)
        return laplace_learning(feats, y, tau=tau, epsilon=epsilon_graph,
                                k=k, solver=solver)

    @jax.jit
    def attack(base_images, base_labels, images, c, min_val, max_val):
        batch = images.shape[0]
        idx = jnp.arange(batch)
        init_out = gl_output(base_images, base_labels, images)
        init_pred = jnp.argmax(init_out, axis=1)
        masked = init_out.at[idx, init_pred].set(-1e6)
        next_pred = jnp.argmax(masked, axis=1)

        w0 = _to_tanh_space(images, min_val, max_val)
        opt = optax.adam(cw_lr)

        def loss_fn(w):
            w_tanh = _from_tanh_space(w, min_val, max_val)
            loss1 = jnp.sum((w_tanh - images) ** 2) / batch
            out = gl_output(base_images, base_labels, w_tanh)
            return loss1 + _cw_margin(out, idx, next_pred, c, batch)

        def body(_, carry):
            w, opt_state = carry
            grads = jax.grad(loss_fn)(w)
            updates, opt_state = opt.update(grads, opt_state, w)
            return optax.apply_updates(w, updates), opt_state

        w, _ = jax.lax.fori_loop(0, iters, body, (w0, opt.init(w0)))
        adv = _from_tanh_space(w, min_val, max_val)
        final_out = gl_output(base_images, base_labels, adv)
        return adv, init_pred, jnp.argmax(final_out, axis=1)

    return attack


def make_mlp_cw_attack(classify: Callable, cw_lr: float = 0.005,
                       iters: int = 100):
    """CW attack for MLP-head models; ``classify(images) -> log-probs``."""

    @jax.jit
    def attack(images, c, min_val, max_val):
        batch = images.shape[0]
        idx = jnp.arange(batch)
        init_out = classify(images)
        init_pred = jnp.argmax(init_out, axis=1)
        masked = init_out.at[idx, init_pred].set(-1e6)
        next_pred = jnp.argmax(masked, axis=1)

        w0 = _to_tanh_space(images, min_val, max_val)
        opt = optax.adam(cw_lr)

        def loss_fn(w):
            w_tanh = _from_tanh_space(w, min_val, max_val)
            loss1 = jnp.sum((w_tanh - images) ** 2) / batch
            probs = jnp.exp(classify(w_tanh))
            return loss1 + _cw_margin(probs, idx, next_pred, c, batch)

        def body(_, carry):
            w, opt_state = carry
            grads = jax.grad(loss_fn)(w)
            updates, opt_state = opt.update(grads, opt_state, w)
            return optax.apply_updates(w, updates), opt_state

        w, _ = jax.lax.fori_loop(0, iters, body, (w0, opt.init(w0)))
        adv = _from_tanh_space(w, min_val, max_val)
        return adv, init_pred, jnp.argmax(classify(adv), axis=1)

    return attack
