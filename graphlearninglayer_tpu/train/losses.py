"""Loss functions (JAX) — equivalents of reference losses.py.

``custom_ce_loss`` is the GLL training loss: the graph layer's outputs are
already (approximately) row-stochastic scores, so cross-entropy is taken on
the raw scores with a log clamp and NO softmax (reference losses.py:128-136,
README.md:125-126).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["custom_ce_loss", "sup_con_loss", "entropy", "logsumexp_loss",
           "l2_loss", "sym_ce_loss"]


def custom_ce_loss(scores: jax.Array, targets: jax.Array) -> jax.Array:
    """CE on probability-like scores: -sum(onehot * log(scores + 1e-8)) / B
    (reference losses.py:128-136).  ``targets`` are integer labels."""
    batch, num_classes = scores.shape
    onehot = jax.nn.one_hot(targets, num_classes, dtype=scores.dtype)
    return -jnp.sum(onehot * jnp.log(scores + 1e-8)) / batch


def entropy(predictions: jax.Array) -> jax.Array:
    """Mean per-sample entropy of probability rows (losses.py:100-101)."""
    return -jnp.sum(predictions * jnp.log(predictions + 1e-8)) / predictions.shape[0]


def logsumexp_loss(predictions: jax.Array) -> jax.Array:
    """Mean row-wise logsumexp (losses.py:105-109)."""
    return jnp.mean(jax.scipy.special.logsumexp(predictions, axis=1))


def l2_loss(predictions: jax.Array) -> jax.Array:
    """-sum(p^2)/B (losses.py:111-112) — maximizes prediction confidence."""
    return -jnp.sum(predictions ** 2) / predictions.shape[0]


def sym_ce_loss(pred1: jax.Array, pred2: jax.Array) -> jax.Array:
    """Symmetric CE between two logit sets on each other's argmax pseudo-labels
    (losses.py:113-126).  Inputs are logits (softmax applied internally)."""
    plabel1 = jax.lax.stop_gradient(jnp.argmax(pred1, axis=1))
    plabel2 = jax.lax.stop_gradient(jnp.argmax(pred2, axis=1))

    def ce(logits, labels):
        logp = jax.nn.log_softmax(logits, axis=1)
        onehot = jax.nn.one_hot(labels, logits.shape[1], dtype=logits.dtype)
        return -jnp.mean(jnp.sum(onehot * logp, axis=1))

    return ce(pred2, plabel1) + ce(pred1, plabel2)


def sup_con_loss(features: jax.Array, labels: jax.Array | None = None,
                 mask: jax.Array | None = None, temperature: float = 0.07,
                 contrast_mode: str = "all",
                 base_temperature: float = 0.07) -> jax.Array:
    """Supervised contrastive / SimCLR loss (reference losses.py:11-98).

    features: (bsz, n_views, dim) unit-norm; labels: (bsz,) ints or None
    (SimCLR mode); mask: optional (bsz, bsz) positives mask.
    """
    if features.ndim < 3:
        raise ValueError("features must be [bsz, n_views, dim]")
    bsz, n_views = features.shape[0], features.shape[1]
    features = features.reshape(bsz, n_views, -1)

    if labels is not None and mask is not None:
        raise ValueError("cannot define both labels and mask")
    if labels is None and mask is None:
        mask = jnp.eye(bsz, dtype=features.dtype)
    elif labels is not None:
        labels = labels.reshape(-1, 1)
        mask = (labels == labels.T).astype(features.dtype)
    else:
        mask = mask.astype(features.dtype)

    contrast_feature = features.transpose(1, 0, 2).reshape(bsz * n_views, -1)
    if contrast_mode == "one":
        anchor_feature, anchor_count = features[:, 0], 1
    elif contrast_mode == "all":
        anchor_feature, anchor_count = contrast_feature, n_views
    else:
        raise ValueError(f"unknown mode {contrast_mode}")

    logits = anchor_feature @ contrast_feature.T / temperature
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=1,
                                                    keepdims=True))
    mask = jnp.tile(mask, (anchor_count, n_views))
    diag = jnp.eye(bsz * anchor_count, bsz * n_views, dtype=logits.dtype)
    logits_mask = 1.0 - diag
    mask = mask * logits_mask

    exp_logits = jnp.exp(logits) * logits_mask
    log_prob = logits - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True))
    mean_log_prob_pos = jnp.sum(mask * log_prob, axis=1) / jnp.sum(mask, axis=1)
    loss = -(temperature / base_temperature) * mean_log_prob_pos
    return jnp.mean(loss.reshape(anchor_count, bsz))
