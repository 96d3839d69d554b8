"""Visualization utilities (reference visualize.py:14-225).

Host-side post-processing: exercises the UMAP->TSNE->PCA fallback chain
(umap is absent in this image, so 'auto' lands on t-SNE), the starred-base
scatter plot, the linear probe, and the top-level visualize() driver.
"""
import os

import numpy as np
import pytest

from graphlearninglayer_tpu.evalx.visualize import (
    embed_2d, linear_probe_accuracy, plot_embedding, visualize)


@pytest.fixture(scope="module")
def blobs():
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(3, 16)) * 6.0
    labels = np.repeat(np.arange(3), 40)
    feats = centers[labels] + rng.normal(size=(120, 16))
    return feats.astype(np.float32), labels


def test_embed_2d_fallback_chain(blobs):
    feats, _ = blobs
    for method in ("auto", "tsne", "pca"):
        emb = embed_2d(feats, method=method, seed=0)
        assert emb.shape == (120, 2)
        assert np.isfinite(emb).all()


def test_embed_2d_umap_explicit_raises_when_missing(blobs):
    feats, _ = blobs
    try:
        import umap  # noqa: F401
        pytest.skip("umap installed")
    except ImportError:
        with pytest.raises(ImportError):
            embed_2d(feats, method="umap")


def test_linear_probe_separable(blobs):
    feats, labels = blobs
    acc = linear_probe_accuracy(feats[::2], labels[::2],
                                feats[1::2], labels[1::2])
    assert acc > 0.9  # well-separated blobs


def test_visualize_writes_pngs(blobs, tmp_path):
    feats, labels = blobs
    base = np.zeros(120, bool)
    base[:6] = True
    emb = visualize(feats, labels, str(tmp_path), base_mask=base,
                    tsne=False, prefix="feat")
    assert emb.shape == (120, 2)
    assert os.path.exists(tmp_path / "feat_umap.png")
    plot_embedding(emb, labels, str(tmp_path / "plain.png"))
    assert os.path.exists(tmp_path / "plain.png")


def test_visualize_cli_from_checkpoint(tmp_path):
    """Standalone CLI (reference visualize.py:55-225): restore an arbitrary
    checkpoint, embed train+test, write the PNG pair, report the probe."""
    import jax
    import jax.numpy as jnp

    from graphlearninglayer_tpu.evalx.visualize import main
    from graphlearninglayer_tpu.models import BuildNet
    from graphlearninglayer_tpu.train.optim import (make_lr_schedule,
                                                    make_optimizer)
    from graphlearninglayer_tpu.train.trainer import create_train_state
    from graphlearninglayer_tpu.utils.checkpoint import save_checkpoint

    model = BuildNet(name="cifarcnn", head="mlp", feat_dim=16, num_classes=10)
    tx = make_optimizer(make_lr_schedule(0.1, epochs=1, steps_per_epoch=1))
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3), jnp.float32))
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), state, 3)

    out = tmp_path / "viz"
    main([str(ckpt), "--dataset", "cifar10", "--model", "cifarcnn",
          "--embedding_dim", "16", "--max_points", "60", "--probe",
          "--save_dir", str(out)])
    assert os.path.exists(out / "cifar10_train_umap.png")
    assert os.path.exists(out / "cifar10_test_umap.png")
