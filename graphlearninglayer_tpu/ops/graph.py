"""Static-shape symmetrized KNN graph for TPU.

This is the TPU-native redesign of the reference's scipy-sparse graph
construction (``knn_sym_dist``, reference GLL.py:180-244).  Instead of a
dynamic-sparsity CSR matrix, we keep the *directed* KNN edge list with fixed
shape (n, k) plus a per-edge coefficient that encodes the symmetrized union
graph:

  * The reference symmetrizes via ``Dist + Dist.T*(Dist.T>Dist) -
    Dist*(Dist.T>Dist)`` (GLL.py:197), i.e. elementwise max of Dist and
    Dist^T.  With an exact (deterministic) KNN the two directions of an edge
    carry identical distances, so the symmetrized matrix is simply the *union*
    of directed edges with the original distance values.
  * A union edge {i,j} may appear once (only i->j in the KNN lists) or twice
    (both directions).  We assign each directed edge a coefficient
    ``coef = 1.0`` (unique direction) or ``0.5`` (reciprocal pair), so that
    scatter-accumulating both endpoint contributions of every directed edge
    reproduces the symmetric matrix exactly.
  * The reference drops explicit zeros (``sparse.find``, GLL.py:198): the
    self-edge (distance 0) and any coincident-point edge never enter W.  We
    replicate with ``coef = 0`` on those edges.

Everything downstream (degree, Laplacian apply, SpMM, the backward's
SDDMM-style edge products) is expressed as gathers + segment-sums over this
static structure, which XLA maps to efficient TPU code with no dynamic shapes.

Affinity values (reference GLL.py:216-218):
    W_ij     = exp(-4 d_ij^2 / (eps_i eps_j))
    V_ij     = -8 W_ij / (eps_i eps_j)              (dW/d(d^2) * 2)
    mod_V_ij = d_ij^2 V_ij / (2 eps_i^2)            (row-asymmetric)
with eps_i = d(i, k-th neighbor of i) in 'auto' mode (GLL.py:205), or a fixed
scalar otherwise.  NOTE the reference computes W/V with the *unclamped* eps
(its ``eps = np.maximum(eps, 1e-6)`` at GLL.py:242 happens after W/V are
formed and eps is not returned), so we do the same and only warn-equivalent
via a ``min_eps`` floor applied identically (i.e. not at all by default).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .knn import knn, knn_tiled

__all__ = [
    "BatchGraph",
    "build_graph",
    "edge_weights",
    "sym_rowsum",
    "sym_spmm",
    "dense_weight_matrix",
]


class BatchGraph(NamedTuple):
    """Fixed-shape symmetrized KNN graph over n nodes with k directed edges/node.

    Attributes:
      nbr:   (n, k) int32 — ``nbr[i, 0] == i`` (self), then nearest neighbors.
      dist2: (n, k) float — squared euclidean distance along each edge.
      coef:  (n, k) float — symmetrization coefficient: 0.0 for masked edges
             (self / zero-distance), 0.5 for reciprocal pairs, 1.0 otherwise.
      eps:   (n,) float — per-node kernel bandwidth (k-th NN distance in auto
             mode; broadcast scalar otherwise).
    """

    nbr: jax.Array
    dist2: jax.Array
    coef: jax.Array
    eps: jax.Array

    @property
    def n(self) -> int:
        return self.nbr.shape[0]

    @property
    def k(self) -> int:
        return self.nbr.shape[1]

    @property
    def kth(self) -> jax.Array:
        """Index of each node's k-th nearest neighbor (last KNN column)."""
        return self.nbr[:, -1]


def build_graph(x: jax.Array, k: int, epsilon="auto", *, tiled: bool = False,
                block: int = 1024) -> BatchGraph:
    """Build the symmetrized KNN graph of the rows of ``x``.

    Equivalent of reference ``knn_sym_dist`` (GLL.py:180-244) minus the W/V
    value computation, which is deferred to :func:`edge_weights` (values are
    cheap elementwise functions of dist2/eps and are recomputed on demand —
    rematerialization is cheaper than storing them on TPU).

    ``epsilon``: the string ``'auto'`` for self-tuning bandwidth, else a
    positive float (static).
    """
    n = x.shape[0]
    if tiled:
        nbr, dist2 = knn_tiled(x, k, block)
    else:
        nbr, dist2 = knn(x, k)

    # Reciprocal-edge detection: edge (i, j) is reciprocal iff i appears in
    # j's neighbor list.  nbr[nbr] has shape (n, k, k); compare against i.
    rows = jnp.arange(n, dtype=jnp.int32)
    recip = jnp.any(nbr[nbr] == rows[:, None, None], axis=-1)

    # Mask: drop self edges and exact-zero distances (reference sparse.find
    # drops explicit zeros, GLL.py:198 — coincident points carry no edge).
    valid = (nbr != rows[:, None]) & (dist2 > 0.0)
    coef = jnp.where(valid, jnp.where(recip, 0.5, 1.0), 0.0).astype(x.dtype)

    if isinstance(epsilon, str):
        if epsilon != "auto":
            raise ValueError(f"epsilon must be 'auto' or a float, got {epsilon!r}")
        # eps_i = distance to the k-th neighbor (self counts as neighbor 0),
        # reference GLL.py:205.  Floored at 1e-6: the reference warns on
        # eps < 1e-10 and clamps to 1e-6 (GLL.py:240-242) — but clamps only
        # *after* forming W/V, so its affinities go 0/0 = NaN when a node's
        # k-th neighbor is coincident (collapsed features).  Clamping before
        # use implements the evident intent and keeps the op total; for any
        # non-degenerate graph (eps > 1e-6 everywhere) behavior is identical.
        eps = jnp.maximum(jnp.sqrt(dist2[:, -1]), 1e-6)
    else:
        eps = jnp.full((n,), float(epsilon), dtype=x.dtype)

    return BatchGraph(nbr=nbr, dist2=dist2, coef=coef, eps=eps)


def edge_weights(g: BatchGraph) -> tuple[jax.Array, jax.Array]:
    """Per-directed-edge affinity W and derivative factor V (both (n, k)).

    W_e = exp(-4 d^2 / (eps_i eps_j)),  V_e = -8 W_e / (eps_i eps_j)
    (reference GLL.py:216-217).  Both are symmetric in (i, j).
    """
    eps_i = g.eps[:, None]
    eps_j = g.eps[g.nbr]
    inv = 1.0 / (eps_i * eps_j)
    w = jnp.exp(-4.0 * g.dist2 * inv)
    v = -8.0 * w * inv
    return w, v


def sym_rowsum(g: BatchGraph, vals: jax.Array) -> jax.Array:
    """Row sums of the symmetric matrix whose union-edge values are ``vals``.

    ``vals`` is a (n, k) per-directed-edge array of *symmetric* edge values
    (value of matrix entries (i,j) and (j,i) alike).  Returns (n,) row sums —
    used for node degrees / Laplacian diagonals (reference builds these via
    ``sparse.csgraph.laplacian``, GLL.py:29).
    """
    c = g.coef * vals
    out = jnp.sum(c, axis=1)
    out = out + jax.ops.segment_sum(c.reshape(-1), g.nbr.reshape(-1),
                                    num_segments=g.n)
    return out


def sym_spmm(g: BatchGraph, vals: jax.Array, x: jax.Array) -> jax.Array:
    """Multiply the symmetric edge-value matrix A (entries ``vals``) by ``x``.

    x: (n, l) dense.  Returns A @ x of shape (n, l).  This is the SpMM that
    replaces scipy CSR matvecs in the CG solver and the final sparse G @ X of
    the backward (reference GLL.py:159).
    """
    c = g.coef * vals  # (n, k)
    # Out-edge half: row i accumulates c_e * x[j].
    out = jnp.einsum("nk,nkl->nl", c, x[g.nbr])
    # In-edge half: row j accumulates c_e * x[i].
    contrib = (c[:, :, None] * x[:, None, :]).reshape(-1, x.shape[1])
    out = out + jax.ops.segment_sum(contrib, g.nbr.reshape(-1),
                                    num_segments=g.n)
    return out


def dense_weight_matrix(g: BatchGraph, vals: jax.Array) -> jax.Array:
    """Materialize the symmetric (n, n) matrix with union-edge values ``vals``.

    Used by the dense direct-solver path (n is at most a few thousand in the
    per-batch op, so a dense Luu + MXU Cholesky beats sparse scatter on TPU
    and matches the reference's direct ``spsolve`` numerics, GLL.py:53).
    """
    n, k = g.nbr.shape
    c = (g.coef * vals).reshape(-1)
    rows = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    cols = g.nbr.reshape(-1)
    out = jnp.zeros((n, n), dtype=vals.dtype)
    out = out.at[rows, cols].add(c)
    out = out.at[cols, rows].add(c)
    return out
