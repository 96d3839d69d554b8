"""FGSM / IFGSM attacks through the graph Laplace-learning head.

Port of the reference attack evaluation (adversarial.py:464-637):
  * FGSM: one step of size epsilon; IFGSM: int(5*epsilon/0.05) steps of size
    alpha=0.05 (adversarial.py:492-497).
  * Each step differentiates the custom-CE loss w.r.t. the *batch* rows of
    the base+batch stack — gradients flow through the graph build and solve
    via the op's custom VJP (adversarial.py:524-562).
  * After every step the image is clamped to the (normalized) data range and
    to the epsilon ball around the original (adversarial.py:567-569).

The attack loop is a ``lax.fori_loop`` inside one jit — re-entrant graph
builds per iteration run entirely on device.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ..ops import laplace_learning
from ..train.losses import custom_ce_loss

__all__ = ["fgsm_attack_step", "make_gl_fast_gradient_attack",
           "make_mlp_fast_gradient_attack"]


def fgsm_attack_step(images, step_size, grad, min_val, max_val):
    """One signed-gradient step + data-range clamp (adversarial.py:464-479)."""
    out = images + step_size * jnp.sign(grad)
    return jnp.clip(out, min_val, max_val)


def _num_iters(attack: str, epsilon: float) -> int:
    if attack == "fgsm":
        return 1
    if attack == "ifgsm":
        return max(int(5 * (epsilon / 0.05)), 0)
    raise ValueError("attack must be fgsm or ifgsm")


def make_gl_fast_gradient_attack(encode: Callable, num_classes: int,
                                 tau: float = 0.0, epsilon_graph="auto",
                                 k: int = 25, solver: str = "cholesky",
                                 grad_warn="default"):
    """Attack builder for GL-head models.

    ``encode(images) -> features`` is the frozen eval-mode network.  Returns
    ``attack_fn(base_images, base_labels, images, labels, eps, kind, min_val,
    max_val)`` producing (adv_images, final_pred).  ``grad_warn``: exploding
    -gradient warn threshold of the op backward ('default' = module default,
    None disables — dryruns pass None to keep their tail channel clean).
    """

    def gl_loss(base_images, base_labels, images, labels):
        x = jnp.concatenate([base_images, images], axis=0)
        feats = encode(x)
        y = jax.nn.one_hot(base_labels, num_classes, dtype=feats.dtype)
        pred = laplace_learning(feats, y, tau=tau, epsilon=epsilon_graph,
                                k=k, solver=solver, grad_warn=grad_warn)
        return custom_ce_loss(pred, labels), pred

    grad_fn = jax.grad(lambda img, b_i, b_l, lab: gl_loss(b_i, b_l, img,
                                                          lab)[0])

    # eps and the IFGSM iteration count (adversarial.py:492-495) are traced,
    # so ONE compiled program serves the whole epsilon sweep (fori_loop with
    # a dynamic trip count lowers to while_loop).
    @partial(jax.jit, static_argnames=("kind",))
    def _attack(base_images, base_labels, images, labels, eps, iters, kind,
                min_val, max_val):
        step = eps if kind == "fgsm" else 0.05
        lo = images - eps
        hi = images + eps

        def body(_, data):
            g = grad_fn(data, base_images, base_labels, labels)
            data = fgsm_attack_step(data, step, g, min_val, max_val)
            return jnp.clip(data, lo, hi)

        adv = jax.lax.fori_loop(0, iters, body, images)
        _, pred = gl_loss(base_images, base_labels, adv, labels)
        return adv, jnp.argmax(pred, axis=1)

    def attack(base_images, base_labels, images, labels, eps, kind,
               min_val, max_val):
        iters = _num_iters(kind, float(eps))
        return _attack(base_images, base_labels, images, labels,
                       jnp.float32(eps), jnp.int32(iters), kind, min_val,
                       max_val)

    return attack


def make_mlp_fast_gradient_attack(classify: Callable):
    """Attack builder for MLP-head models; ``classify(images) -> log-probs``.
    Uses NLL loss on log-probabilities (adversarial.py:553-560)."""

    def nll(images, labels):
        logp = classify(images)
        onehot = jax.nn.one_hot(labels, logp.shape[1], dtype=logp.dtype)
        return -jnp.mean(jnp.sum(onehot * logp, axis=1))

    grad_fn = jax.grad(nll)

    @partial(jax.jit, static_argnames=("kind",))
    def _attack(images, labels, eps, iters, kind, min_val, max_val):
        step = eps if kind == "fgsm" else 0.05
        lo, hi = images - eps, images + eps

        def body(_, data):
            g = grad_fn(data, labels)
            data = fgsm_attack_step(data, step, g, min_val, max_val)
            return jnp.clip(data, lo, hi)

        adv = jax.lax.fori_loop(0, iters, body, images)
        return adv, jnp.argmax(classify(adv), axis=1)

    def attack(images, labels, eps, kind, min_val, max_val):
        iters = _num_iters(kind, float(eps))
        return _attack(images, labels, jnp.float32(eps), jnp.int32(iters),
                       kind, min_val, max_val)

    return attack
