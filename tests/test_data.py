import numpy as np

from graphlearninglayer_tpu.data import (BatchLoader, ScoredDataset,
                                         Transform, select_base_indices,
                                         synthetic_dataset)


def test_synthetic_dataset_shapes():
    spec = synthetic_dataset(num_classes=4, image_shape=(28, 28, 1),
                             n_train=200, n_test=50)
    assert spec.train_images.shape == (200, 28, 28, 1)
    assert spec.train_images.dtype == np.uint8
    assert spec.num_classes == 4
    assert set(np.unique(spec.train_labels)) <= set(range(4))


def test_select_base_indices_modes(rng):
    labels = np.repeat(np.arange(5), 20)
    idx = select_base_indices(labels, 25, 5, "random",
                              rng=np.random.default_rng(0))
    assert len(idx) == 25
    counts = np.bincount(labels[idx], minlength=5)
    assert np.all(counts == 5)

    scores = rng.normal(size=100)
    idx2 = select_base_indices(labels, 10, 5, "score", scores=scores)
    for c in range(5):
        cls_idx = np.flatnonzero(labels == c)
        top2 = cls_idx[np.argsort(-scores[cls_idx])[:2]]
        assert set(idx2[labels[idx2] == c]) == set(top2)


def test_scored_dataset_refresh():
    spec = synthetic_dataset(num_classes=2, n_train=40, n_test=10)
    ds = ScoredDataset(spec)
    ds.update_scores(np.arange(10), np.full(10, 5.0))
    imgs, labels = ds.select_base(4, mode="score")
    assert imgs.shape[0] == 4
    counts = np.bincount(labels, minlength=2)
    assert np.all(counts == 2)


def test_batch_loader_strong_aug():
    spec = synthetic_dataset(num_classes=3, n_train=64, n_test=10)
    tf = Transform("synthetic", "strong")
    loader = BatchLoader(spec.train_images, spec.train_labels, 16, tf,
                         seed=0, workers=2)
    batches = list(loader)
    assert len(batches) == 4
    idx, imgs, labels = batches[0]
    assert imgs.shape == (16, 28, 28, 1) and imgs.dtype == np.float32
    assert labels.shape == (16,) and idx.shape == (16,)


def test_batch_loader_eval_deterministic():
    spec = synthetic_dataset(num_classes=2, n_train=32, n_test=10)
    tf = Transform("synthetic", "eval")
    loader = BatchLoader(spec.train_images, spec.train_labels, 8, tf,
                         shuffle=False, workers=0)
    a = [img for _, img, _ in loader]
    b = [img for _, img, _ in loader]
    np.testing.assert_array_equal(np.concatenate(a), np.concatenate(b))
