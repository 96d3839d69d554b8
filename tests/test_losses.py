import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from graphlearninglayer_tpu.train.losses import (custom_ce_loss, entropy,
                                                 l2_loss, sup_con_loss,
                                                 sym_ce_loss)


def test_custom_ce_loss(rng):
    p = rng.uniform(0.01, 1.0, (16, 10))
    p /= p.sum(1, keepdims=True)
    t = rng.integers(0, 10, 16)
    got = float(custom_ce_loss(jnp.asarray(p), jnp.asarray(t)))
    want = -np.sum(np.eye(10)[t] * np.log(p + 1e-8)) / 16
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_entropy_and_l2(rng):
    p = rng.uniform(0.01, 1.0, (8, 5))
    np.testing.assert_allclose(
        float(entropy(jnp.asarray(p))),
        -np.sum(p * np.log(p + 1e-8)) / 8, rtol=1e-6)
    np.testing.assert_allclose(float(l2_loss(jnp.asarray(p))),
                               -np.sum(p ** 2) / 8, rtol=1e-6)


def test_sym_ce_loss_against_torch(rng):
    a = rng.normal(size=(12, 7))
    b = rng.normal(size=(12, 7))
    got = float(sym_ce_loss(jnp.asarray(a), jnp.asarray(b)))
    ta, tb = torch.tensor(a), torch.tensor(b)
    want = (F.cross_entropy(tb, ta.argmax(1)) +
            F.cross_entropy(ta, tb.argmax(1))).item()
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_sup_con_loss_against_torch_formula(rng):
    """Check against a direct numpy transcription of the SupCon definition."""
    bsz, views, dim = 6, 2, 8
    f = rng.normal(size=(bsz, views, dim))
    f = f / np.linalg.norm(f, axis=-1, keepdims=True)
    labels = rng.integers(0, 3, bsz)
    temp = 0.07

    got = float(sup_con_loss(jnp.asarray(f), jnp.asarray(labels),
                             temperature=temp))

    # numpy reference
    contrast = np.concatenate([f[:, v] for v in range(views)], axis=0)
    anchor = contrast
    logits = anchor @ contrast.T / temp
    logits = logits - logits.max(1, keepdims=True)
    mask = (labels[:, None] == labels[None, :]).astype(float)
    mask = np.tile(mask, (views, views))
    logits_mask = 1 - np.eye(bsz * views)
    mask = mask * logits_mask
    exp_logits = np.exp(logits) * logits_mask
    log_prob = logits - np.log(exp_logits.sum(1, keepdims=True))
    mean_log_prob_pos = (mask * log_prob).sum(1) / mask.sum(1)
    want = float(np.mean(-mean_log_prob_pos))
    np.testing.assert_allclose(got, want, rtol=1e-6)
