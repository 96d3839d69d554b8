"""Transductive Laplace learning over large graphs (the eval path).

Equivalent of the reference's numpy ``laplace()`` (utils.py:570-593): build a
k=50 KNN graph over base + train + test features (up to ~60k nodes for
CIFAR-10, utils.py:637-651), then solve the label-propagation system with a
Jacobi-preconditioned ``stable_conjgrad``.  The reference runs this entirely
on CPU in scipy; here the KNN is a tiled MXU computation and the CG iterates
on-device over the static edge structure.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .graph import build_graph, edge_weights, sym_rowsum, sym_spmm
from .solve import stable_conjgrad

__all__ = ["one_hot_encode", "transductive_laplace"]


def one_hot_encode(labels: jax.Array, n_classes: int) -> jax.Array:
    """One-hot rows for integer labels (reference utils.py:556-568)."""
    return jax.nn.one_hot(labels, n_classes, dtype=jnp.float32)


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def transductive_laplace(x, y, knn_num: int = 50, epsilon="auto",
                         tau: float = 1e-8, knn_block: int = 2048):
    """Full-dataset Laplace learning; labeled rows are 0..k_lab-1.

    x: (n, d) features; y: (k_lab, l) one-hot labels.  Returns (n - k_lab, l)
    scores for the unlabeled rows.  Mirrors reference utils.py:570-593:
    Luu + tau*I with Jacobi preconditioner M = diag^(-1/2) and
    ``Pred = M cg(M Luu M, -M Lul Y)``.
    """
    n = x.shape[0]
    k_lab, l = y.shape
    m = n - k_lab

    g = build_graph(x, knn_num, epsilon, tiled=True, block=knn_block)
    w, _ = edge_weights(g)
    deg = sym_rowsum(g, w)

    y_full = jnp.concatenate([y, jnp.zeros((m, l), y.dtype)], axis=0)
    rhs = sym_spmm(g, w, y_full)[k_lab:]          # -Lul @ Y

    diag = deg[k_lab:] + jnp.asarray(tau, w.dtype)
    mscale = 1.0 / jnp.sqrt(diag + 1e-10)

    def mv(p):
        p = mscale[:, None] * p
        p_full = jnp.pad(p, ((k_lab, 0), (0, 0)))
        wp = sym_spmm(g, w, p_full)[k_lab:]
        return mscale[:, None] * (diag[:, None] * p - wp)

    z = stable_conjgrad(mv, mscale[:, None] * rhs)
    return mscale[:, None] * z
