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


def test_batchloader_prefetch_matches_synchronous():
    """Background prefetch must yield the same batches in the same order as
    the synchronous loader (one producer thread = same RNG stream)."""
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (64, 28, 28, 1), dtype=np.uint8)
    labels = rng.integers(0, 10, 64)
    tf = Transform("synthetic", "weak")
    mk = lambda pf: BatchLoader(images, labels, 16, tf, seed=7, workers=0,
                                backend="pil", prefetch=pf)
    sync_batches = list(mk(0))
    pre_batches = list(mk(2))
    assert len(sync_batches) == len(pre_batches) == 4
    for (i0, x0, y0), (i1, x1, y1) in zip(sync_batches, pre_batches):
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_array_equal(y0, y1)
        np.testing.assert_allclose(x0, x1)


def test_batchloader_prefetch_early_break():
    """Abandoning iteration mid-epoch must not hang (stop event reaches the
    producer)."""
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (64, 28, 28, 1), dtype=np.uint8)
    labels = rng.integers(0, 10, 64)
    tf = Transform("synthetic", "weak")
    loader = BatchLoader(images, labels, 16, tf, seed=7, workers=0,
                         backend="pil", prefetch=2)
    for n, _ in enumerate(loader):
        if n == 1:
            break
    # a fresh epoch still works after the abandoned one
    assert len(list(loader)) == 4
