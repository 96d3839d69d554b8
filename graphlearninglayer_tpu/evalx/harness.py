"""Evaluation harnesses: per-batch GL / MLP eval and transductive eval.

Equivalents of reference utils.py:241-267 (loader_to_numpy feature
extraction), utils.py:596-634 (test_network) and utils.py:637-660
(test_GL_NP): encode base + train + test sets on device and run the full
-dataset transductive Laplace solve over the ~60k-node k=50 graph.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import transductive_laplace
from ..train.trainer import (TrainState, make_encode_step, make_gl_eval_step,
                             make_mlp_eval_step)

__all__ = ["encode_dataset", "test_network", "test_gl_transductive"]


def encode_dataset(encode_step, state: TrainState, images: np.ndarray,
                   normalize_fn, batch_size: int = 1024) -> np.ndarray:
    """Feature extraction over a dataset in fixed-size device batches
    (loader_to_numpy, utils.py:241-267).  The tail batch is padded to keep a
    single compiled shape and trimmed after."""
    feats = []
    n = len(images)
    for i in range(0, n, batch_size):
        chunk = images[i:i + batch_size]
        pad = batch_size - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, chunk[:pad]], axis=0)
        x = jnp.asarray(normalize_fn(chunk))
        f = np.asarray(encode_step(state, x))
        feats.append(f[: len(images[i:i + batch_size])])
    return np.concatenate(feats, axis=0)


def test_network(model, state: TrainState, base_images, base_labels,
                 test_images, test_labels, num_classes: int, tau: float,
                 epsilon="auto", k: int = 25, batch_size: int = 1250,
                 solver: str = "cholesky", normalize_fn=None,
                 predictor: str = "GL") -> float:
    """Per-batch network accuracy (test_network, utils.py:596-634).

    predictor='GL': each test batch is classified by the network + graph
    head against the single base batch (lap(features, Y, opt.temp), so pass
    the driver's --temp as ``tau``).  predictor='MLP': the aux classifier
    head alone (utils.py:621-624).  A tail batch shorter than ``batch_size``
    is padded to the compiled shape (repeating its rows) and only the real
    rows are scored — the reference instead runs a smaller final graph;
    deviation noted in PARITY.md.
    """
    if predictor == "GL":
        gl_step = make_gl_eval_step(model, num_classes, tau, epsilon, k,
                                    solver)
    elif predictor == "MLP":
        mlp_step = make_mlp_eval_step(model)
    else:
        raise ValueError(predictor)
    norm = normalize_fn if normalize_fn is not None else (lambda a: a)
    if predictor == "GL":
        base_x = jnp.asarray(norm(np.asarray(base_images)))
        base_y = jnp.asarray(base_labels)
    correct = 0
    n = len(test_images)
    for i in range(0, n, batch_size):
        chunk = test_images[i:i + batch_size]
        real = len(chunk)
        if real < batch_size:
            chunk = chunk[np.arange(batch_size) % real]
        x = jnp.asarray(norm(np.asarray(chunk)))
        if predictor == "GL":
            pred = gl_step(state, base_x, base_y, x)
        else:
            pred = mlp_step(state, x)
        correct += int(np.sum(np.asarray(pred)[:real] ==
                              test_labels[i:i + real]))
    acc = 100.0 * correct / max(n, 1)
    print(f"Test set: Accuracy for {predictor} predictor: {correct}/{n} "
          f"({acc:.2f}%)\n")
    return acc


def test_gl_transductive(model, state: TrainState, base_images, base_labels,
                         test_images, test_labels, normalize_fn,
                         num_classes: int, train_images=None,
                         knn_num: int = 50, epsilon="auto",
                         tau: float = 1e-8, batch_size: int = 1024) -> float:
    """Full transductive eval (test_GL_NP, utils.py:637-660): features of
    base + (optional) unlabeled-train + test, one big k=50 graph, CG solve;
    accuracy on the test slice."""
    encode_step = make_encode_step(model)
    base_f = encode_dataset(encode_step, state, base_images, normalize_fn,
                            batch_size)
    test_f = encode_dataset(encode_step, state, test_images, normalize_fn,
                            batch_size)
    parts = [base_f]
    if train_images is not None:
        parts.append(encode_dataset(encode_step, state, train_images,
                                    normalize_fn, batch_size))
    parts.append(test_f)
    all_f = jnp.asarray(np.concatenate(parts, axis=0))
    y = jnp.asarray(np.eye(num_classes, dtype=np.float32)[base_labels])
    u = transductive_laplace(all_f, y, knn_num=knn_num, epsilon=epsilon,
                             tau=tau)
    pred = np.asarray(jnp.argmax(u, axis=1))[-len(test_images):]
    acc = 100.0 * float(np.mean(pred == test_labels))
    print(f"Test set: Accuracy for GL predictor "
          f"(Num of train data: {len(base_images)})\t: "
          f"{int(acc * len(test_images) / 100)}/{len(test_images)} "
          f"({acc:.2f}%)\n")
    return acc
