"""Generate the checked-in miniature dataset fixtures in each REAL on-disk
format the framework reads (data/datasets.py):

  * MNIST / FashionMNIST IDX  (train-images-idx3-ubyte, ...)
  * CIFAR-10 / CIFAR-100 python pickle batches
  * mini-imagenet Ravi&Larochelle pickle caches
  * mini-imagenet image-folder tree (separate root: the pkl caches would
    otherwise win the format probe)

Images are the deterministic learnable synthetic patterns (so 1-epoch
driver dress rehearsals actually reduce loss), written through each
format's native byte layout.  Run from the repo root:

    python tests/fixtures/make_fixtures.py

The outputs are CHECKED IN so the dress-rehearsal tests exercise the
readers against fixed bytes, independent of this writer.
"""
from __future__ import annotations

import os
import pickle
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from graphlearninglayer_tpu.data.datasets import synthetic_dataset

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.join(HERE, "data")          # $GLL_DATA_DIR for pkl/idx/pickle
FOLDER_ROOT = os.path.join(HERE, "data_folder")  # image-folder variant


def _balanced(spec_images, spec_labels, per_class, num_classes, seed):
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(num_classes):
        cand = np.flatnonzero(spec_labels == c)
        rows.append(rng.choice(cand, per_class, replace=False))
    rows = np.concatenate(rows)
    rng.shuffle(rows)
    return spec_images[rows], spec_labels[rows]


def write_idx(name: str, seed: int):
    spec = synthetic_dataset(10, (28, 28, 1), n_train=2048, n_test=512,
                             seed=seed)
    tri, trl = _balanced(spec.train_images, spec.train_labels, 20, 10, seed)
    tei, tel = _balanced(spec.test_images, spec.test_labels, 5, 10, seed + 1)
    d = os.path.join(ROOT, name)
    os.makedirs(d, exist_ok=True)

    def idx_images(path, imgs):
        n, h, w, _ = imgs.shape
        with open(path, "wb") as f:
            f.write(struct.pack(">HBB", 0, 8, 3))
            f.write(struct.pack(">III", n, h, w))
            f.write(imgs[..., 0].tobytes())

    def idx_labels(path, labels):
        with open(path, "wb") as f:
            f.write(struct.pack(">HBB", 0, 8, 1))
            f.write(struct.pack(">I", len(labels)))
            f.write(labels.astype(np.uint8).tobytes())

    idx_images(os.path.join(d, "train-images-idx3-ubyte"), tri)
    idx_labels(os.path.join(d, "train-labels-idx1-ubyte"), trl)
    idx_images(os.path.join(d, "t10k-images-idx3-ubyte"), tei)
    idx_labels(os.path.join(d, "t10k-labels-idx1-ubyte"), tel)
    print(f"{name}: {len(trl)} train / {len(tel)} test (IDX)")


def write_cifar10():
    spec = synthetic_dataset(10, (32, 32, 3), n_train=2048, n_test=512,
                             seed=11)
    tri, trl = _balanced(spec.train_images, spec.train_labels, 20, 10, 11)
    tei, tel = _balanced(spec.test_images, spec.test_labels, 5, 10, 12)
    d = os.path.join(ROOT, "cifar-10-batches-py")
    os.makedirs(d, exist_ok=True)
    per = len(trl) // 5

    def dump(path, imgs, labels):
        data = imgs.transpose(0, 3, 1, 2).reshape(len(imgs), -1)
        with open(path, "wb") as f:
            pickle.dump({b"data": np.ascontiguousarray(data),
                         b"labels": [int(v) for v in labels]}, f)

    for i in range(5):
        dump(os.path.join(d, f"data_batch_{i + 1}"),
             tri[i * per:(i + 1) * per], trl[i * per:(i + 1) * per])
    dump(os.path.join(d, "test_batch"), tei, tel)
    print(f"cifar10: {len(trl)} train / {len(tel)} test (pickle)")


def write_cifar100():
    # reader-coverage fixture: 100-class format with a 25-class subset of
    # labels present (keeps the file tiny; class-uniform driver sampling
    # needs the full-class mnist/cifar10 fixtures instead)
    spec = synthetic_dataset(25, (32, 32, 3), n_train=512, n_test=512,
                             seed=21)
    tri, trl = _balanced(spec.train_images, spec.train_labels, 4, 25, 21)
    tei, tel = _balanced(spec.test_images, spec.test_labels, 1, 25, 22)
    d = os.path.join(ROOT, "cifar-100-python")
    os.makedirs(d, exist_ok=True)

    def dump(path, imgs, labels):
        data = imgs.transpose(0, 3, 1, 2).reshape(len(imgs), -1)
        with open(path, "wb") as f:
            pickle.dump({b"data": np.ascontiguousarray(data),
                         b"fine_labels": [int(v) for v in labels]}, f)

    dump(os.path.join(d, "train"), tri, trl)
    dump(os.path.join(d, "test"), tei, tel)
    print(f"cifar100: {len(trl)} train / {len(tel)} test (pickle)")


def write_miniimagenet_pkl():
    spec = synthetic_dataset(9, (84, 84, 3), n_train=512, n_test=64, seed=31)
    os.makedirs(ROOT, exist_ok=True)
    # 3 episodic caches with DISJOINT class sets (the real layout), 3
    # classes x 4 images each
    for si, split in enumerate(("train", "val", "test")):
        imgs, class_dict, row = [], {}, 0
        for ci in range(3):
            c = si * 3 + ci
            rows = np.flatnonzero(spec.train_labels == c)[:4]
            imgs.append(spec.train_images[rows])
            class_dict[f"n{c:08d}"] = list(range(row, row + len(rows)))
            row += len(rows)
        with open(os.path.join(ROOT, f"mini-imagenet-cache-{split}.pkl"),
                  "wb") as f:
            pickle.dump({"image_data": np.concatenate(imgs),
                         "class_dict": class_dict}, f)
    print("miniimagenet: 3 caches x 3 classes x 4 images (pkl)")


def write_miniimagenet_folder():
    import PIL.Image

    spec = synthetic_dataset(2, (84, 84, 3), n_train=128, n_test=32, seed=41)
    base = os.path.join(FOLDER_ROOT, "miniimagenet")
    for split, n_per in (("train", 3), ("test", 1)):
        pool_i = spec.train_images if split == "train" else spec.test_images
        pool_l = spec.train_labels if split == "train" else spec.test_labels
        for c in range(2):
            d = os.path.join(base, split, f"n{c:08d}")
            os.makedirs(d, exist_ok=True)
            rows = np.flatnonzero(pool_l == c)[:n_per]
            for r in rows:
                PIL.Image.fromarray(pool_i[r]).save(
                    os.path.join(d, f"img_{int(r):04d}.png"))
    print("miniimagenet folder: 2 classes, 3 train + 1 test each (png)")


if __name__ == "__main__":
    write_idx("mnist", 1)
    write_idx("fashion_mnist", 2)
    write_cifar10()
    write_cifar100()
    write_miniimagenet_pkl()
    write_miniimagenet_folder()
