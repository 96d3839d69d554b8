import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphlearninglayer_tpu.models import (BuildNet, CifarCNN, CustomCNN,
                                           SmallCNN, SmallCNNGL,
                                           preact_resnet18, resnet18,
                                           wrn_28_2)
from graphlearninglayer_tpu.models.buildnet import model_dict


def _init_apply(model, shape, train=False):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, shape, jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x, train=False)
    out = model.apply(variables, x, train=train,
                      rngs={"dropout": rng},
                      mutable=["batch_stats"] if train else False)
    return out[0] if train else out


def test_custom_cnn_shapes():
    pred, feat = _init_apply(CustomCNN(), (4, 28, 28, 1))
    assert pred.shape == (4, 10) and feat.shape == (4, 128)
    np.testing.assert_allclose(np.asarray(pred).sum(1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(feat), axis=1), 1.0,
                               atol=1e-5)


def test_resnet18_feature_dim():
    feat = _init_apply(resnet18(), (2, 32, 32, 3))
    assert feat.shape == (2, 512)


def test_wrn_28_2_feature_dim():
    feat = _init_apply(wrn_28_2(), (2, 32, 32, 3))
    assert feat.shape == (2, 128)


def test_cifarcnn_feature_dim():
    feat = _init_apply(CifarCNN(), (2, 32, 32, 3))
    assert feat.shape == (2, 128)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(feat), axis=1), 1.0,
                               atol=1e-5)


def test_preact_resnet18():
    pred, feat = _init_apply(preact_resnet18(), (2, 32, 32, 3))
    assert pred.shape == (2, 10) and feat.shape == (2, 128)
    # log-softmax rows (float32 model arithmetic => loose tolerance)
    np.testing.assert_allclose(np.exp(np.asarray(pred)).sum(1), 1.0, atol=1e-4)


def test_resnet_mnist_supcon_wrappers():
    """Functional forward coverage of the resnet_MNIST wrappers (reference
    networks/resnet_MNIST.py:165-237): SupConResNet emits an L2-normalized
    feat_dim embedding, SupCEResNet raw logits, LinearClassifier a probe
    over given features, SmallNet log-softmax rows."""
    from graphlearninglayer_tpu.models.resnet_mnist import (
        LinearClassifier, SmallNet, SupCEResNet, SupConResNet,
        mnist_model_dict)

    for head in ("linear", "mlp"):
        feat = _init_apply(SupConResNet(name="resnet18", head=head,
                                        feat_dim=24), (2, 28, 28, 1))
        assert feat.shape == (2, 24)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(feat), axis=1),
                                   1.0, atol=1e-5)

    logits = _init_apply(SupCEResNet(name="resnet18", num_classes=7),
                         (2, 28, 28, 1))
    assert logits.shape == (2, 7)
    # raw logits, not probabilities
    assert not np.allclose(np.asarray(logits).sum(1), 1.0, atol=1e-3)

    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (3, 512), jnp.float32)
    clf = LinearClassifier(num_classes=5)
    vars_c = clf.init(rng, feats)
    out = clf.apply(vars_c, feats)
    assert out.shape == (3, 5)

    logp = _init_apply(SmallNet(num_classes=10), (2, 28, 28, 1))
    assert logp.shape == (2, 10)
    np.testing.assert_allclose(np.exp(np.asarray(logp)).sum(1), 1.0,
                               atol=1e-4)

    # the dict advertises the encoder feature dims the wrappers rely on
    for name, (make, dim) in mnist_model_dict.items():
        if name != "resnet18":
            continue
        enc_feat = _init_apply(make(), (2, 28, 28, 1))
        assert enc_feat.shape == (2, dim)


def test_smallcnn_pair():
    logp = _init_apply(SmallCNN(), (2, 28, 28, 1))
    assert logp.shape == (2, 10)
    feat = _init_apply(SmallCNNGL(), (2, 28, 28, 1))
    assert feat.shape == (2, 200)


@pytest.mark.parametrize("head", ["linear", "mlp", "no"])
def test_buildnet_heads(head):
    model = BuildNet(name="wrn-28-2", head=head, feat_dim=64, num_classes=10)
    pred, feat = _init_apply(model, (2, 32, 32, 3))
    assert pred.shape == (2, 10)
    expected = 128 if head == "no" else 64
    assert feat.shape == (2, expected)
    np.testing.assert_allclose(np.asarray(pred).sum(1), 1.0, atol=1e-5)


def test_buildnet_batchstats_update():
    model = BuildNet(name="wrn-28-2", head="linear", feat_dim=32)
    (pred, feat) = _init_apply(model, (2, 32, 32, 3), train=True)
    assert pred.shape == (2, 10)


def test_buildnet_bf16_mixed_precision():
    """bf16 encoder compute (--bf16): params stay float32, features come
    back float32 and unit-norm, and the direction agrees with the f32
    model at bf16 tolerance (same init => same params tree)."""
    kw = dict(name="resnet18", head="mlp", feat_dim=64, num_classes=10)
    m32 = BuildNet(**kw)
    m16 = BuildNet(**kw, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (4, 32, 32, 3), jnp.float32)
    v = m32.init({"params": rng, "dropout": rng}, x, train=False)
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(v["params"]))
    p32, f32_ = m32.apply(v, x, train=False)
    p16, f16_ = m16.apply(v, x, train=False)  # same f32 params tree
    assert f16_.dtype == jnp.float32 and p16.dtype == jnp.float32
    np.testing.assert_allclose(np.linalg.norm(np.asarray(f16_), axis=1), 1.0,
                               atol=1e-5)
    cos = (np.asarray(f16_) * np.asarray(f32_)).sum(1)
    assert (cos > 0.98).all(), cos
    np.testing.assert_allclose(np.asarray(p16), np.asarray(p32), atol=0.05)


@pytest.mark.parametrize("make,shape", [
    (lambda: resnet18(dtype=jnp.bfloat16), (2, 32, 32, 3)),
    (lambda: wrn_28_2(dtype=jnp.bfloat16), (2, 32, 32, 3)),
    (lambda: CifarCNN(dtype=jnp.bfloat16), (2, 32, 32, 3)),
    (lambda: CustomCNN(dtype=jnp.bfloat16), (2, 28, 28, 1)),
    (lambda: preact_resnet18(dtype=jnp.bfloat16), (2, 32, 32, 3)),
])
def test_encoders_accept_bf16(make, shape):
    out = _init_apply(make(), shape)
    for leaf in jax.tree_util.tree_leaves(out):
        assert np.isfinite(np.asarray(leaf, np.float32)).all()


def test_smallcnn_zero_init_final_linear():
    """Reference zero-inits the final classifier (adversarial.py:305-306):
    the untrained model must output the uniform distribution."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from graphlearninglayer_tpu.models import SmallCNN

    m = SmallCNN(num_classes=10)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 28, 28, 1)),
                    jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.log(0.1), atol=1e-6)


@pytest.mark.parametrize("size", [28, 32])
@pytest.mark.parametrize("name", sorted(model_dict))
def test_buildnet_every_encoder_every_input_size(name, size):
    """Every registered encoder must compose with BuildNet at both the
    28x28 (MNIST-family) and 32x32 (CIFAR-family) geometries — a fixed
    pooling window that assumes 32x32 yields zero-size features at 28x28
    (caught live with wrn-28-2)."""
    import jax

    model = BuildNet(name=name, head="mlp", feat_dim=16, num_classes=4)
    x = jnp.zeros((2, size, size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    pred, feat = model.apply(variables, x, train=False)
    assert pred.shape == (2, 4)
    assert feat.shape == (2, 16)
    assert bool(jnp.all(jnp.isfinite(feat)))
