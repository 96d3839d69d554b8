"""PGD adversarial-training inner loops.

Port of the reference robust-training loops (train_and_adversarial.py:613-754):
random uniform(-eps, eps) init + range clamp, then ``num_iters`` signed
-gradient steps of size ``alpha``, each clamped to the eps ball and the data
range.  The GL variant differentiates the custom-CE loss of the graph head
w.r.t. the perturbed batch rows of the base+batch stack — a FULL graph
build + solve + implicit-diff backward per PGD step (6 graph solves per
optimizer step at the default 5 iterations), which is exactly where the
static-shape on-device op pays off.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..ops import laplace_learning
from ..train.losses import custom_ce_loss

__all__ = ["make_gl_pgd_perturb", "make_mlp_pgd_perturb",
           "make_gl_pgd_perturb_p", "make_mlp_pgd_perturb_p"]


def make_gl_pgd_perturb_p(apply_feats: Callable, num_classes: int,
                          tau: float = 0.0, epsilon_graph="auto",
                          k: int = 25, solver: str = "cholesky",
                          eps: float = 0.3, alpha: float = 0.01,
                          num_iters: int = 40):
    """Parameterized PGD perturbation: the (live) model parameters are
    *arguments*, so one jitted function serves every training step — no
    per-batch retracing.  ``apply_feats(params, batch_stats, images) ->
    features`` must be a fixed pure function."""

    def gl_loss(images, params, batch_stats, base_images, base_labels,
                labels):
        x = jnp.concatenate([base_images, images], axis=0)
        feats = apply_feats(params, batch_stats, x)
        y = jax.nn.one_hot(base_labels, num_classes, dtype=feats.dtype)
        pred = laplace_learning(feats, y, tau=tau, epsilon=epsilon_graph,
                                k=k, solver=solver)
        return custom_ce_loss(pred, labels)

    grad_fn = jax.grad(gl_loss)

    @jax.jit
    def perturb(params, batch_stats, base_images, base_labels, images,
                labels, rng, min_val, max_val):
        noise = jax.random.uniform(rng, images.shape, images.dtype, -eps,
                                   eps)
        data = jnp.clip(images + noise, min_val, max_val)
        lo, hi = images - eps, images + eps

        def body(_, data):
            g = grad_fn(data, params, batch_stats, base_images, base_labels,
                        labels)
            data = jnp.clip(data + alpha * jnp.sign(g), lo, hi)
            return jnp.clip(data, min_val, max_val)

        return jax.lax.fori_loop(0, num_iters, body, data)

    return perturb


def make_mlp_pgd_perturb_p(apply_logp: Callable, eps: float = 0.3,
                           alpha: float = 0.01, num_iters: int = 40):
    """Parameterized MLP-head PGD; ``apply_logp(params, batch_stats,
    images) -> log-probs``."""

    def nll(images, params, batch_stats, labels):
        logp = apply_logp(params, batch_stats, images)
        onehot = jax.nn.one_hot(labels, logp.shape[1], dtype=logp.dtype)
        return -jnp.mean(jnp.sum(onehot * logp, axis=1))

    grad_fn = jax.grad(nll)

    @jax.jit
    def perturb(params, batch_stats, images, labels, rng, min_val, max_val):
        noise = jax.random.uniform(rng, images.shape, images.dtype, -eps,
                                   eps)
        data = jnp.clip(images + noise, min_val, max_val)
        lo, hi = images - eps, images + eps

        def body(_, data):
            g = grad_fn(data, params, batch_stats, labels)
            data = jnp.clip(data + alpha * jnp.sign(g), lo, hi)
            return jnp.clip(data, min_val, max_val)

        return jax.lax.fori_loop(0, num_iters, body, data)

    return perturb


def make_gl_pgd_perturb(encode: Callable, num_classes: int, tau: float = 0.0,
                        epsilon_graph="auto", k: int = 25,
                        solver: str = "cholesky", eps: float = 0.3,
                        alpha: float = 0.01, num_iters: int = 40):
    """Returns jitted ``perturb(params_closure_args..., base_images,
    base_labels, images, labels, rng, min_val, max_val) -> adv_images``.

    ``encode(images) -> features`` must close over the current (frozen for
    the inner loop) model parameters; the reference likewise attacks with
    the live model inside ``model.train()`` (train_and_adversarial.py:700-729).
    """

    def gl_loss(images, base_images, base_labels, labels):
        x = jnp.concatenate([base_images, images], axis=0)
        feats = encode(x)
        y = jax.nn.one_hot(base_labels, num_classes, dtype=feats.dtype)
        pred = laplace_learning(feats, y, tau=tau, epsilon=epsilon_graph,
                                k=k, solver=solver)
        return custom_ce_loss(pred, labels)

    grad_fn = jax.grad(gl_loss)

    @jax.jit
    def perturb(base_images, base_labels, images, labels, rng, min_val,
                max_val):
        noise = jax.random.uniform(rng, images.shape, images.dtype,
                                   -eps, eps)
        data = jnp.clip(images + noise, min_val, max_val)
        lo, hi = images - eps, images + eps

        def body(_, data):
            g = grad_fn(data, base_images, base_labels, labels)
            data = data + alpha * jnp.sign(g)
            data = jnp.clip(data, lo, hi)
            return jnp.clip(data, min_val, max_val)

        return jax.lax.fori_loop(0, num_iters, body, data)

    return perturb


def make_mlp_pgd_perturb(classify: Callable, eps: float = 0.3,
                         alpha: float = 0.01, num_iters: int = 40):
    """PGD perturbation against an MLP head (NLL on log-probs,
    train_and_adversarial.py:613-664)."""

    def nll(images, labels):
        logp = classify(images)
        onehot = jax.nn.one_hot(labels, logp.shape[1], dtype=logp.dtype)
        return -jnp.mean(jnp.sum(onehot * logp, axis=1))

    grad_fn = jax.grad(nll)

    @jax.jit
    def perturb(images, labels, rng, min_val, max_val):
        noise = jax.random.uniform(rng, images.shape, images.dtype, -eps, eps)
        data = jnp.clip(images + noise, min_val, max_val)
        lo, hi = images - eps, images + eps

        def body(_, data):
            g = grad_fn(data, labels)
            data = data + alpha * jnp.sign(g)
            data = jnp.clip(data, lo, hi)
            return jnp.clip(data, min_val, max_val)

        return jax.lax.fori_loop(0, num_iters, body, data)

    return perturb
