"""Attack-suite tests: FGSM/IFGSM/CW/PGD through the graph head.

Uses a fixed random linear encoder so the graph head is the only nonlinearity
— checks the attacks (a) stay inside their constraint sets, (b) increase the
loss / flip predictions relative to clean inputs, (c) run re-entrantly under
jit (the lax.fori_loop graph rebuilds).
"""
import jax
import jax.numpy as jnp
import numpy as np

from graphlearninglayer_tpu.attack import (make_gl_cw_attack,
                                           make_gl_fast_gradient_attack,
                                           make_gl_pgd_perturb,
                                           make_mlp_fast_gradient_attack)
from graphlearninglayer_tpu.models import l2_normalize
from graphlearninglayer_tpu.ops import laplace_learning
from graphlearninglayer_tpu.train.losses import custom_ce_loss


def _setup(rng, n_base=16, n_batch=24, dim=12, l=3):
    w = jnp.asarray(rng.normal(size=(dim, 8)))

    def encode(images):  # images are flat vectors here
        return l2_normalize(jnp.tanh(images @ w))

    base = jnp.asarray(rng.normal(size=(n_base, dim)))
    base_labels = jnp.asarray(rng.integers(0, l, n_base))
    images = jnp.asarray(rng.normal(size=(n_batch, dim)))
    labels = jnp.asarray(rng.integers(0, l, n_batch))
    return encode, base, base_labels, images, labels, l


def _gl_loss(encode, base, base_labels, images, labels, l):
    x = jnp.concatenate([base, images], axis=0)
    feats = encode(x)
    y = jax.nn.one_hot(base_labels, l, dtype=feats.dtype)
    pred = laplace_learning(feats, y, tau=0.07, k=6)
    return float(custom_ce_loss(pred, labels))


def test_fgsm_increases_loss_within_ball(rng):
    encode, base, base_labels, images, labels, l = _setup(rng)
    attack = make_gl_fast_gradient_attack(encode, l, tau=0.07, k=6)
    eps = 0.25
    adv, pred = attack(base, base_labels, images, labels, eps, "fgsm",
                       -10.0, 10.0)
    delta = np.asarray(adv - images)
    assert np.max(np.abs(delta)) <= eps + 1e-6
    clean = _gl_loss(encode, base, base_labels, images, labels, l)
    attacked = _gl_loss(encode, base, base_labels, adv, labels, l)
    assert attacked > clean


def test_ifgsm_stronger_than_fgsm(rng):
    encode, base, base_labels, images, labels, l = _setup(rng)
    attack = make_gl_fast_gradient_attack(encode, l, tau=0.07, k=6)
    eps = 0.3
    adv_f, _ = attack(base, base_labels, images, labels, eps, "fgsm",
                      -10.0, 10.0)
    adv_i, _ = attack(base, base_labels, images, labels, eps, "ifgsm",
                      -10.0, 10.0)
    assert np.max(np.abs(np.asarray(adv_i - images))) <= eps + 1e-6
    lf = _gl_loss(encode, base, base_labels, adv_f, labels, l)
    li = _gl_loss(encode, base, base_labels, adv_i, labels, l)
    assert li >= 0.8 * lf  # iterated attack at least comparable


def test_mlp_fgsm(rng):
    wcls = jnp.asarray(rng.normal(size=(12, 3)))

    def classify(images):
        return jax.nn.log_softmax(images @ wcls, axis=1)

    images = jnp.asarray(rng.normal(size=(10, 12)))
    labels = jnp.argmax(classify(images), axis=1)  # start correct
    attack = make_mlp_fast_gradient_attack(classify)
    adv, pred = attack(images, labels, 0.5, "fgsm", -10.0, 10.0)
    flipped = np.mean(np.asarray(pred) != np.asarray(labels))
    assert flipped > 0.3  # large-eps FGSM flips a good fraction


def test_cw_attack_flips_and_stays_close(rng):
    encode, base, base_labels, images, labels, l = _setup(rng)
    attack = make_gl_cw_attack(encode, l, tau=0.07, k=6, iters=30)
    adv, init_pred, final_pred = attack(base, base_labels, images, 50.0,
                                        -4.0, 4.0)
    assert np.all(np.isfinite(np.asarray(adv)))
    # tanh-space parameterization respects the data range
    assert np.min(np.asarray(adv)) >= -4.0 - 1e-5
    assert np.max(np.asarray(adv)) <= 4.0 + 1e-5
    flipped = np.mean(np.asarray(final_pred) != np.asarray(init_pred))
    assert flipped > 0.2


def test_pgd_perturb_constraints(rng):
    encode, base, base_labels, images, labels, l = _setup(rng)
    # data must lie inside the clamp range (as real normalized datasets do);
    # the final range clamp may otherwise move out-of-range pixels further
    # than eps (same behavior as the reference's last clamp,
    # train_and_adversarial.py:729)
    images = jnp.clip(images, -1.2, 1.2)
    perturb = make_gl_pgd_perturb(encode, l, tau=0.07, k=6, eps=0.3,
                                  alpha=0.1, num_iters=5)
    adv = perturb(base, base_labels, images, labels, jax.random.PRNGKey(0),
                  -1.5, 1.5)
    delta = np.asarray(adv - images)
    assert np.max(np.abs(delta)) <= 0.3 + 1e-6
    assert np.min(np.asarray(adv)) >= -1.5 - 1e-6
    assert np.max(np.asarray(adv)) <= 1.5 + 1e-6
    # PGD should raise the training loss vs clean input
    clean = _gl_loss(encode, base, base_labels, images, labels, l)
    attacked = _gl_loss(encode, base, base_labels, adv, labels, l)
    assert attacked > clean
