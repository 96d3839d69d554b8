"""Scipy/numpy oracle reproducing the reference op's semantics for parity tests.

This is a fresh implementation (float64, scipy.sparse) of the behavior
documented in SURVEY.md §2.1 for ``LaplaceLearningSparseHard``
(reference GLL.py:10-177) and ``knn_sym_dist`` (GLL.py:180-244), with one
deliberate difference: exact brute-force KNN instead of Annoy's approximate
search, so that the TPU implementation and this oracle operate on identical
graphs.  (Annoy's output is itself an approximation of exact KNN, so exact
search is the canonical target; `graphlearning` is not vendored.)

Forward:  W via union-symmetrized KNN distances and the exp(-4 d^2/(e_i e_j))
affinity, L = D - W, solve (Luu + tau I) P = -Lul Y with a direct solver.
Backward: implicit differentiation — solve (Luu + tau I) w = g, pad, form the
edgewise product matrix G, return Lap(G o V) X plus the auto-eps correction
-Lap_sym(C o b) X.
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spl


def brute_knn(x: np.ndarray, k: int):
    """Exact euclidean KNN, self first. Returns (idx, dist) both (n, k)."""
    d2 = np.sum(x * x, 1)[:, None] + np.sum(x * x, 1)[None, :] - 2 * x @ x.T
    np.fill_diagonal(d2, -1.0)  # pin self strictly first
    order = np.argsort(d2, axis=1, kind="stable")[:, :k]
    dist2 = np.maximum(np.take_along_axis(d2, order, axis=1), 0.0)
    return order, np.sqrt(dist2)


def build_affinity(x: np.ndarray, k: int, epsilon):
    """Union-symmetrized KNN affinity; returns (W, V, mod_V, C, knn_ind, eps).

    Mirrors knn_sym_dist (GLL.py:180-244): COO from per-row neighbor lists,
    elementwise-max symmetrization, zero entries dropped, and in 'auto' mode
    eps_i = distance to the k-th neighbor with the selector matrix
    C[kth(i), i] = 1.
    """
    n = x.shape[0]
    knn_ind, knn_dist = brute_knn(x, k)
    rows0 = np.repeat(np.arange(n), k)
    dist = sp.coo_matrix((knn_dist.ravel(), (rows0, knn_ind.ravel())),
                         shape=(n, n)).tocsr()
    dist = dist.maximum(dist.T)
    r, c, d = sp.find(dist)  # explicit zeros (self / coincident) are dropped

    if isinstance(epsilon, str) and epsilon == "auto":
        eps = np.asarray(dist[np.arange(n), knn_ind[:, -1]]).ravel()
        C = sp.coo_matrix((np.ones(n), (knn_ind[:, -1], np.arange(n))),
                          shape=(n, n)).tocsr()
        C.data[:] = 1.0
    else:
        eps = np.full(n, float(epsilon))
        C = None

    wv = np.exp(-4.0 * d * d / (eps[r] * eps[c]))
    vv = -8.0 * wv / (eps[r] * eps[c])
    W = sp.coo_matrix((wv, (r, c)), shape=(n, n)).tocsr()
    V = sp.coo_matrix((vv, (r, c)), shape=(n, n)).tocsr()
    if C is not None:
        mvv = d * d * vv / (eps[r] ** 2) / 2.0
        mod_V = sp.coo_matrix((mvv, (r, c)), shape=(n, n)).tocsr()
    else:
        mod_V = None
    return W, V, mod_V, C, knn_ind, eps


def forward(x: np.ndarray, y: np.ndarray, tau: float = 0.0, epsilon="auto",
            k: int = 25):
    """Returns (pred, ctx) — pred is (n - k_lab, l)."""
    n = x.shape[0]
    k_lab = y.shape[0]
    W, V, mod_V, C, knn_ind, eps = build_affinity(x, k, epsilon)
    L = sp.csgraph.laplacian(W).tocsr()
    luu = L[k_lab:, k_lab:] + tau * sp.identity(n - k_lab, format="csr")
    lul = L[k_lab:, :k_lab]
    pred = spl.spsolve(luu.tocsc(), -lul @ y)
    pred = np.asarray(pred).reshape(n - k_lab, y.shape[1])
    ctx = dict(W=W, V=V, mod_V=mod_V, C=C, luu=luu, knn_ind=knn_ind, eps=eps,
               x=x, y=y, pred=pred)
    return pred, ctx


def _edge_product(V: sp.csr_matrix, wfull: np.ndarray, ffull: np.ndarray):
    """G with G_ij = sum_c (w_c[i]-w_c[j])(F_c[j]-F_c[i]) on the pattern of V.

    Emulates the reference's per-class gl.graph(-V).gradient products
    (GLL.py:111-120) in one vectorized pass.
    """
    r, c, _ = sp.find(-V)
    vals = np.einsum("el,el->e", wfull[r] - wfull[c], ffull[c] - ffull[r])
    return sp.coo_matrix((vals, (r, c)), shape=V.shape).tocsr()


def backward(ctx: dict, gbar: np.ndarray) -> np.ndarray:
    """Gradient of the scalar loss w.r.t. X, given upstream gbar (m, l)."""
    x, y, pred = ctx["x"], ctx["y"], ctx["pred"]
    V, mod_V, C, luu = ctx["V"], ctx["mod_V"], ctx["C"], ctx["luu"]
    n = x.shape[0]
    k_lab = y.shape[0]

    wu = spl.spsolve(luu.tocsc(), gbar)
    wu = np.asarray(wu).reshape(gbar.shape)
    wfull = np.concatenate([np.zeros_like(y, dtype=wu.dtype), wu], axis=0)
    ffull = np.concatenate([y, pred], axis=0)

    G = _edge_product(V, wfull, ffull)

    if C is not None:
        b = np.asarray(G.multiply(mod_V).sum(axis=1)).ravel()
        T = sp.csgraph.laplacian(C.multiply(b), symmetrized=True)
        extra = -T @ x
    else:
        extra = 0.0

    GV = sp.csgraph.laplacian(G.multiply(V))
    return GV @ x + extra


def one_hot(labels: np.ndarray, l: int) -> np.ndarray:
    out = np.zeros((len(labels), l))
    out[np.arange(len(labels)), labels] = 1.0
    return out
