"""Device-resident eval path (--device_data): encode_dataset_resident and
the resident branch of test_gl_transductive must reproduce the streaming
eval bitwise (same per-row eval-mode encode, no padded-duplicate rows)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from graphlearninglayer_tpu.evalx.harness import (
    encode_dataset, encode_dataset_resident)
from graphlearninglayer_tpu.evalx.harness import \
    test_gl_transductive as gl_transductive
from graphlearninglayer_tpu.models import l2_normalize
from graphlearninglayer_tpu.train import create_train_state, make_encode_step
from graphlearninglayer_tpu.train import make_lr_schedule, make_optimizer


class Enc(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.relu(nn.Conv(8, (3, 3), strides=2, padding=1)(x))
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = jnp.mean(x, axis=(1, 2))
        feat = nn.Dense(16)(x)
        return nn.softmax(nn.Dense(3)(feat)), l2_normalize(feat)


def _setup(rng, n, h=10, w=10, c=1):
    model = Enc()
    tx = make_optimizer(make_lr_schedule(0.1, 5, 5))
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, h, w, c), jnp.float32))
    imgs = rng.integers(0, 256, (n, h, w, c), np.uint8)
    return model, state, imgs


def test_encode_resident_matches_streaming(rng):
    # n=70, batch 32: two full chunks + an overlapping tail re-slice
    model, state, imgs = _setup(rng, 70)
    norm = ((0.5,), (0.25,))
    stream = encode_dataset(make_encode_step(model, norm=norm), state,
                            imgs, None, batch_size=32)
    data_dev = jnp.asarray(imgs.reshape(70, -1))
    res = encode_dataset_resident(model, state, data_dev, 70, (10, 10, 1),
                                  norm, batch_size=32)
    np.testing.assert_allclose(np.asarray(res), stream, atol=1e-6)


def test_encode_resident_small_dataset(rng):
    # n < batch_size: the chunk size clamps to n
    model, state, imgs = _setup(rng, 12)
    norm = ((0.5,), (0.25,))
    stream = encode_dataset(make_encode_step(model, norm=norm), state,
                            imgs, None, batch_size=64)
    res = encode_dataset_resident(model, state,
                                  jnp.asarray(imgs.reshape(12, -1)), 12,
                                  (10, 10, 1), norm, batch_size=64)
    np.testing.assert_allclose(np.asarray(res), stream, atol=1e-6)


def test_transductive_resident_matches_streaming(rng):
    model, state, train_imgs = _setup(rng, 60)
    test_imgs = rng.integers(0, 256, (20, 10, 10, 1), np.uint8)
    labels = rng.integers(0, 3, 60)
    test_labels = rng.integers(0, 3, 20)
    base_sel = rng.permutation(60)[:9]
    base_imgs = train_imgs[base_sel]
    base_labels = labels[base_sel]
    norm = ((0.5,), (0.25,))

    acc_stream = gl_transductive(
        model, state, base_imgs, base_labels, test_imgs, test_labels,
        None, 3, train_images=train_imgs, knn_num=8, epsilon="auto",
        tau=1e-8, batch_size=32, norm=norm)
    acc_res = gl_transductive(
        model, state, base_imgs, base_labels, test_imgs, test_labels,
        None, 3, train_images=train_imgs, knn_num=8, epsilon="auto",
        tau=1e-8, batch_size=32, norm=norm,
        resident=(jnp.asarray(train_imgs.reshape(60, -1)),
                  jnp.asarray(test_imgs.reshape(20, -1)),
                  base_sel, (10, 10, 1)))
    assert acc_res == acc_stream
