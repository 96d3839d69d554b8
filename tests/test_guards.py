"""Runtime invariant guards + eval-harness cadence pieces.

Covers the reference's per-step NaN sweep (FullySup.py:188-190), the
exploding-gradient warning in the op backward
(train_and_adversarial.py:177-183), and ``test_network`` with both
predictors (utils.py:596-634) now wired into the fullysup eval cadence.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import graphlearninglayer_tpu.ops.laplace as laplace_mod
from graphlearninglayer_tpu.data import synthetic_dataset, Transform
from graphlearninglayer_tpu.evalx import test_network as network_eval
from graphlearninglayer_tpu.models import l2_normalize
from graphlearninglayer_tpu.ops import laplace_learning
from graphlearninglayer_tpu.train import (create_train_state,
                                          make_gl_train_step,
                                          make_lr_schedule, make_optimizer)
from graphlearninglayer_tpu.train.trainer import params_finite


class TinyNet(nn.Module):
    num_classes: int = 4

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.relu(nn.Conv(8, (3, 3), strides=2, padding=1)(x))
        x = jnp.mean(x, axis=(1, 2))
        feat = nn.Dense(16)(x)
        pred = nn.softmax(nn.Dense(self.num_classes)(feat), axis=1)
        return pred, l2_normalize(feat)


def _setup(num_classes=4, n_train=96, seed=0):
    spec = synthetic_dataset(num_classes=num_classes, n_train=n_train,
                             n_test=64, seed=seed)
    model = TinyNet(num_classes)
    tx = make_optimizer(make_lr_schedule(0.01, epochs=1, steps_per_epoch=1))
    x0 = jnp.zeros((1, *spec.image_shape), jnp.float32)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), x0)
    return spec, model, tx, state


def test_params_finite_guard_fires_on_injected_nan():
    spec, model, tx, state = _setup()
    tf = Transform("synthetic", "eval")
    step = make_gl_train_step(model, tx, 4, tau=0.07, epsilon="auto", k=6)

    imgs = jnp.asarray(tf.normalize(spec.train_images[:48]))
    labels = jnp.asarray(spec.train_labels[:48])
    base = jnp.asarray(tf.normalize(spec.train_images[48:64]))
    base_l = jnp.asarray(spec.train_labels[48:64])

    _, metrics, _ = step(state, base, base_l, imgs, labels,
                         jax.random.PRNGKey(1))
    assert bool(metrics["params_finite"])

    # poison one parameter tensor with a NaN — the sweep must flag it
    bad_params = jax.tree_util.tree_map(lambda p: p, state.params)
    leaves, treedef = jax.tree_util.tree_flatten(bad_params)
    leaves[0] = leaves[0].at[(0,) * leaves[0].ndim].set(jnp.nan)
    bad_params = jax.tree_util.tree_unflatten(treedef, leaves)
    assert not bool(params_finite(bad_params))
    bad_state = state._replace(params=bad_params)
    _, metrics, _ = step(bad_state, base, base_l, imgs, labels,
                         jax.random.PRNGKey(1))
    assert not bool(metrics["params_finite"])


def test_exploding_grad_warning_fires(capfd):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(60, 8)))
    y = jnp.asarray(np.eye(3)[rng.integers(0, 3, 12)])
    gbar = jnp.asarray(rng.normal(size=(48, 3)))

    def loss(xj):
        return jnp.sum(laplace_learning(xj, y, tau=0.0, k=6) * gbar)

    old = laplace_mod.GRAD_NORM_WARN_THRESHOLD
    try:
        laplace_mod.GRAD_NORM_WARN_THRESHOLD = 1e-12
        g = jax.grad(loss)(x)
        jax.block_until_ready(g)
        jax.effects_barrier()
        out = capfd.readouterr()
        assert "possible exploding gradient" in out.out + out.err
        # threshold high again: no warning
        laplace_mod.GRAD_NORM_WARN_THRESHOLD = 1e12
        g = jax.grad(loss)(x)
        jax.block_until_ready(g)
        jax.effects_barrier()
        out = capfd.readouterr()
        assert "possible exploding gradient" not in out.out + out.err
    finally:
        laplace_mod.GRAD_NORM_WARN_THRESHOLD = old


def test_grad_warn_per_call_override(capfd):
    """grad_warn=None must silence the exploding-grad warning even when the
    module-level threshold would fire, and a tiny per-call threshold must
    fire even when the module level is huge (the dryrun/driver split)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(60, 8)))
    y = jnp.asarray(np.eye(3)[rng.integers(0, 3, 12)])
    gbar = jnp.asarray(rng.normal(size=(48, 3)))

    def loss(xj, gw):
        return jnp.sum(laplace_learning(xj, y, tau=0.0, k=6, grad_warn=gw)
                       * gbar)

    old = laplace_mod.GRAD_NORM_WARN_THRESHOLD
    try:
        laplace_mod.GRAD_NORM_WARN_THRESHOLD = 1e-12
        g = jax.grad(lambda xj: loss(xj, None))(x)
        jax.block_until_ready(g)
        jax.effects_barrier()
        out = capfd.readouterr()
        assert "possible exploding gradient" not in out.out + out.err

        laplace_mod.GRAD_NORM_WARN_THRESHOLD = 1e12
        g = jax.grad(lambda xj: loss(xj, 1e-12))(x)
        jax.block_until_ready(g)
        jax.effects_barrier()
        out = capfd.readouterr()
        assert "possible exploding gradient" in out.out + out.err
    finally:
        laplace_mod.GRAD_NORM_WARN_THRESHOLD = old


def test_network_tail_batch_matches_oracle_smaller_graph(capfd):
    """A tail test batch shorter than the compiled batch size must follow
    the reference's semantics (utils.py:596-634): run as a SMALLER final
    graph.  tail='exact' (the default) must reproduce the oracle's smaller
    -graph accuracy on a non-divisible test set; tail='pad' (the
    compile-free fallback) is allowed to deviate (duplicated rows perturb
    KNN lists and auto-eps) but must stay within a few points."""
    from tests.oracle import reference_op as ref

    from graphlearninglayer_tpu.train.trainer import make_encode_step

    spec, model, tx, state = _setup(n_train=128, seed=3)
    tf = Transform("synthetic", "eval")
    base_imgs, base_labels = spec.train_images[:24], spec.train_labels[:24]
    n_test, bs, k, tau = 64, 40, 6, 0.07   # one full batch + 24-row tail
    test_imgs, test_labels = spec.test_images[:n_test], \
        spec.test_labels[:n_test]
    assert n_test % bs != 0

    kwargs = dict(tau=tau, epsilon="auto", k=k, batch_size=bs,
                  normalize_fn=tf.normalize, predictor="GL")
    acc_exact = network_eval(model, state, base_imgs, base_labels, test_imgs,
                             test_labels, 4, **kwargs)
    acc_pad = network_eval(model, state, base_imgs, base_labels, test_imgs,
                           test_labels, 4, tail="pad", **kwargs)
    capfd.readouterr()

    # oracle: same encoder features, each batch the reference way — the
    # tail as a smaller graph (no padding)
    encode = make_encode_step(model)
    base_f = np.asarray(encode(state, jnp.asarray(tf.normalize(base_imgs))),
                        np.float64)
    y_oh = ref.one_hot(np.asarray(base_labels), 4)
    correct = 0
    for i in range(0, n_test, bs):
        chunk_f = np.asarray(
            encode(state, jnp.asarray(tf.normalize(test_imgs[i:i + bs]))),
            np.float64)
        scores, _ = ref.forward(np.concatenate([base_f, chunk_f]), y_oh,
                                tau=tau, epsilon="auto", k=k)
        pred = np.argmax(scores, axis=1)
        correct += int(np.sum(pred == test_labels[i:i + len(chunk_f)]))
    oracle_acc = 100.0 * correct / n_test

    # exact tail == reference semantics (<=1 f32-vs-f64 borderline flip)
    assert abs(acc_exact - oracle_acc) <= 100.0 * 1 / n_test
    # padded tail: documented deviation, bounded
    assert abs(acc_pad - oracle_acc) <= 100.0 * 6 / n_test


def test_test_network_gl_and_mlp_predictors(capfd):
    spec, model, tx, state = _setup(n_train=128)
    tf = Transform("synthetic", "eval")
    base_imgs = spec.train_images[:32]
    base_labels = spec.train_labels[:32]

    # batch_size 40 over 64 test images -> one full + one padded tail batch
    acc_gl = network_eval(model, state, base_imgs, base_labels,
                          spec.test_images, spec.test_labels, 4, tau=0.07,
                          epsilon="auto", k=6, batch_size=40,
                          normalize_fn=tf.normalize, predictor="GL")
    acc_mlp = network_eval(model, state, base_imgs, base_labels,
                           spec.test_images, spec.test_labels, 4, tau=0.07,
                           k=6, batch_size=40, normalize_fn=tf.normalize,
                           predictor="MLP")
    out = capfd.readouterr().out
    assert "Accuracy for GL predictor" in out
    assert "Accuracy for MLP predictor" in out
    for acc in (acc_gl, acc_mlp):
        assert 0.0 <= acc <= 100.0
    # every test point is scored exactly once (padded tail trimmed)
    assert f"/{len(spec.test_images)} " in out
