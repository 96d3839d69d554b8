"""Real-data dress rehearsal: the production drivers must train on datasets
read from the REAL on-disk formats (checked-in miniature fixtures under
tests/fixtures/data*), so a mounted real dataset works on the first try.

The synthetic fallback is POISONED in every test — if a reader silently
fails and the driver falls back, the test errors instead of passing on
synthetic data.
"""
import os

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
import pytest

import graphlearninglayer_tpu.data.datasets as ds_mod
from graphlearninglayer_tpu.config.cli import parse_option
from graphlearninglayer_tpu.data import load_dataset
from graphlearninglayer_tpu.models import l2_normalize
from graphlearninglayer_tpu.models import buildnet as bn

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "data")
FIXTURES_FOLDER = os.path.join(os.path.dirname(__file__), "fixtures",
                               "data_folder")


class TinyEncoder(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.relu(nn.Conv(8, (3, 3), strides=2, padding=1)(x))
        x = jnp.mean(x, axis=(1, 2))
        return l2_normalize(nn.Dense(16)(x))


def _poison_synthetic(monkeypatch):
    def boom(*a, **kw):
        raise AssertionError("synthetic fallback used — real-format reader "
                             "failed on the fixtures")

    monkeypatch.setattr(ds_mod, "synthetic_dataset", boom)


@pytest.fixture()
def fixture_env(tmp_path, monkeypatch):
    monkeypatch.setenv("GLL_DATA_DIR", FIXTURES)
    monkeypatch.setitem(bn.model_dict, "tinycnn",
                        (lambda dtype=jnp.float32: TinyEncoder(), 16))
    monkeypatch.chdir(tmp_path)
    _poison_synthetic(monkeypatch)
    return monkeypatch


def _fullysup_argv(dataset, num_train, batch):
    return ["--sup_train_type", "gl", "--dataset", dataset,
            "--model", "tinycnn", "--epochs", "1",
            "--batch_size", str(batch), "--num_train", str(num_train),
            "--knn_k", "6", "--num_workers", "0", "--plot_freq_ss", "100",
            "--epsilon", "auto", "--augment_type_sup", "weak"]


@pytest.mark.parametrize("dataset,num_train,batch",
                         [("cifar10", 10, 32), ("mnist", 10, 32),
                          ("fashion_mnist", 10, 32),
                          ("miniimagenet", 9, 16)])
def test_fullysup_trains_on_real_format_fixtures(fixture_env, dataset,
                                                 num_train, batch):
    from graphlearninglayer_tpu.train import fullysup

    opt = parse_option(_fullysup_argv(dataset, num_train, batch))
    records = fullysup.run_training(opt)
    assert len(records["loss"]) == 1
    assert np.isfinite(records["loss"][0])
    assert len(records["test_acc"]) >= 1      # epoch-0 transductive eval ran


def test_adversarial_driver_trains_on_mnist_idx_fixtures(fixture_env,
                                                         tmp_path):
    from graphlearninglayer_tpu.train.adversarial_driver import run

    results = run("gl", "natural", "mnist", epochs=1,
                  save_dir=str(tmp_path / "models"))
    assert "gl_acc" in results and 0.0 <= results["gl_acc"] <= 1.0


def test_miniimagenet_folder_tree_reader(monkeypatch):
    monkeypatch.setenv("GLL_DATA_DIR", FIXTURES_FOLDER)
    _poison_synthetic(monkeypatch)
    spec = load_dataset("miniimagenet")
    assert spec.train_images.shape[1:] == (84, 84, 3)
    assert spec.train_images.dtype == np.uint8
    assert spec.num_classes == 2
    assert len(spec.train_labels) == 6 and len(spec.test_labels) == 2


def test_fixture_readers_shapes(monkeypatch):
    """Every checked-in fixture loads through its real reader with the
    expected geometry and balanced-enough labels for class-uniform base
    sampling (cifar100 is reader-coverage only: 25 of 100 classes)."""
    monkeypatch.setenv("GLL_DATA_DIR", FIXTURES)
    _poison_synthetic(monkeypatch)
    for name, shape, n_cls in (("mnist", (28, 28, 1), 10),
                               ("fashion_mnist", (28, 28, 1), 10),
                               ("cifar10", (32, 32, 3), 10),
                               ("cifar100", (32, 32, 3), 100),
                               ("miniimagenet", (84, 84, 3), 9)):
        spec = load_dataset(name)
        assert spec.train_images.shape[1:] == shape, name
        assert spec.train_images.dtype == np.uint8, name
        assert spec.num_classes == n_cls, name
        assert spec.train_labels.max() < n_cls, name
