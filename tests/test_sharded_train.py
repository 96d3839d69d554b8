"""Sharded vs. unsharded GL train step: one step, identical numerics."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from graphlearninglayer_tpu.models import l2_normalize
from graphlearninglayer_tpu.parallel import make_mesh
from graphlearninglayer_tpu.train import (create_train_state,
                                          make_gl_train_step,
                                          make_lr_schedule, make_optimizer,
                                          make_sharded_gl_train_step)


class Enc(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.relu(nn.Conv(8, (3, 3), strides=2, padding=1)(x))
        x = jnp.mean(x, axis=(1, 2))
        feat = nn.Dense(16)(x)
        return nn.softmax(nn.Dense(3)(feat)), l2_normalize(feat)


def test_sharded_step_matches_unsharded(rng):
    num_classes, base_n, batch_n = 3, 16, 32
    model = Enc()
    tx = make_optimizer(make_lr_schedule(0.1, 5, 5))
    x0 = jnp.zeros((1, 12, 12, 1), jnp.float32)
    key = jax.random.PRNGKey(0)

    base_x = jnp.asarray(rng.normal(size=(base_n, 12, 12, 1)), jnp.float32)
    base_y = jnp.asarray(rng.integers(0, num_classes, base_n))
    x = jnp.asarray(rng.normal(size=(batch_n, 12, 12, 1)), jnp.float32)
    y = jnp.asarray(rng.integers(0, num_classes, batch_n))

    state0 = create_train_state(model, tx, key, x0)
    plain = make_gl_train_step(model, tx, num_classes, tau=0.07, k=5)
    s1, m1, sc1 = plain(state0, base_x, base_y, x, y, key)

    mesh = make_mesh(8, axes=("data", "graph"))
    sharded = make_sharded_gl_train_step(model, tx, num_classes, mesh,
                                         tau=0.07, k=5)
    with mesh:
        s2, m2, sc2 = sharded(state0, base_x, base_y, x, y, key)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sc1), np.asarray(sc2), atol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_from_data_step_matches_unsharded(rng):
    """Device-resident dataset + mesh: the sharded gather/augment/train step
    must reproduce the single-device from_data step exactly (the augmentation
    RNG stream is derived from the step key, not from the sharding)."""
    from graphlearninglayer_tpu.data.device_aug import DeviceTransform
    from graphlearninglayer_tpu.train import (
        make_gl_train_step_from_data, make_sharded_gl_train_step_from_data)

    num_classes, base_n, batch_n, n_data = 3, 16, 32, 128
    h, w, c = 12, 12, 1
    model = Enc()
    tx = make_optimizer(make_lr_schedule(0.1, 5, 5))
    key = jax.random.PRNGKey(0)
    state0 = create_train_state(model, tx, key,
                                jnp.zeros((1, h, w, c), jnp.float32))

    data = jnp.asarray(rng.integers(0, 256, (n_data, h * w * c)), jnp.uint8)
    base_idx = jnp.asarray(rng.permutation(n_data)[:base_n])
    base_y = jnp.asarray(rng.integers(0, num_classes, base_n))
    idx = jnp.asarray(rng.permutation(n_data)[:batch_n])
    y = jnp.asarray(rng.integers(0, num_classes, batch_n))

    aug = DeviceTransform("synthetic", "weak")
    norm = (aug.mean, aug.std)
    plain = make_gl_train_step_from_data(
        model, tx, num_classes, (h, w, c), tau=0.07, k=5, norm=norm, aug=aug)
    s1, m1, sc1 = plain(state0, data, base_idx, base_y, idx, y, key)

    mesh = make_mesh(8, axes=("data", "graph"))
    sharded = make_sharded_gl_train_step_from_data(
        model, tx, num_classes, (h, w, c), mesh, tau=0.07, k=5, norm=norm,
        aug=aug)
    with mesh:
        s2, m2, sc2 = sharded(state0, data, base_idx, base_y, idx, y, key)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sc1), np.asarray(sc2), atol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_mlp_from_data_step_matches_unsharded(rng):
    from graphlearninglayer_tpu.data.device_aug import DeviceTransform
    from graphlearninglayer_tpu.train import (
        make_mlp_train_step_from_data, make_sharded_mlp_train_step_from_data)

    batch_n, n_data, h, w, c = 32, 128, 12, 12, 1
    model = Enc()
    tx = make_optimizer(make_lr_schedule(0.1, 5, 5))
    key = jax.random.PRNGKey(1)
    state0 = create_train_state(model, tx, key,
                                jnp.zeros((1, h, w, c), jnp.float32))

    data = jnp.asarray(rng.integers(0, 256, (n_data, h * w * c)), jnp.uint8)
    idx = jnp.asarray(rng.permutation(n_data)[:batch_n])
    y = jnp.asarray(rng.integers(0, 3, batch_n))

    aug = DeviceTransform("synthetic", "weak")
    norm = (aug.mean, aug.std)
    plain = make_mlp_train_step_from_data(model, tx, (h, w, c), norm=norm,
                                          aug=aug)
    s1, m1 = plain(state0, data, idx, y, key)

    mesh = make_mesh(8, axes=("data", "graph"))
    sharded = make_sharded_mlp_train_step_from_data(
        model, tx, (h, w, c), mesh, norm=norm, aug=aug)
    with mesh:
        s2, m2 = sharded(state0, data, idx, y, key)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
