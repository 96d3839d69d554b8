"""Dense-mode graph Laplace learning — the MXU-native fast path.

For per-batch graphs (n up to a few thousand: the training op, the PGD/CW
attack inner loops) the TPU-optimal formulation is *dense*: an n x n matrix
is small (9 MB at n=1500), while gather/scatter over the edge list costs
millions of random-access element ops that TPUs execute serially.  This
module reformulates the whole op as elementwise n x n math + MXU matmuls:

  * union symmetrization = elementwise max of the directed KNN mask with its
    transpose (no reciprocal-edge bookkeeping at all);
  * the backward's edge product matrix
        G_ij = sum_c (w_c[i]-w_c[j])(F_c[j]-F_c[i])
    expands to  W_f + W_f^T - wf 1^T - 1 wf^T  with W_f = w @ F^T (one
    matmul) and wf_i = <w_i, F_i> (a row dot);
  * Lap(A) X = deg_A * X - A @ X — matmuls;
  * the auto-eps vector b is a masked elementwise product + row sum.

The only remaining non-matmul ops are the KNN top-k (needed for eps and the
k-th-neighbor selector) and two (n,) / (n, k)-sized scatters.  Numerics are
identical to the edge-list path (ops/graph.py) — cross-checked in tests.

Semantics follow reference GLL.py:10-244 exactly (see ops/laplace.py
docstring for the mapping).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .knn import knn, pairwise_dist2

__all__ = ["DenseGraph", "build_dense_graph", "dense_affinity",
           "dense_forward", "dense_backward"]


class DenseGraph(NamedTuple):
    """Dense symmetrized KNN graph over n nodes.

    m_raw: (n, n) {0,1} float — RAW directed KNN indicator
           (m_raw[i, nbr[i, :]] = 1).  The union symmetrization and
           self/zero-distance exclusions (reference GLL.py:196-198) are
           applied lazily (``mask`` property) or inside the Pallas affinity
           kernel — never as standalone n x n HBM passes on the hot path.
    d2:    (n, n) float — full squared-distance matrix.
    eps:   (n,) float — per-node bandwidth (k-th NN distance in auto mode).
    nbr:   (n, k) int32 — KNN lists (kept for the auto-eps selector).
    """

    m_raw: jax.Array
    d2: jax.Array
    eps: jax.Array
    nbr: jax.Array

    @property
    def mask(self) -> jax.Array:
        """Final symmetrized edge mask (union of directed KNN edges; self
        and zero-distance entries dropped)."""
        n = self.m_raw.shape[0]
        mask = jnp.maximum(self.m_raw, self.m_raw.T)
        off_diag = 1.0 - jnp.eye(n, dtype=mask.dtype)
        return mask * off_diag * (self.d2 > 0.0)

    @property
    def n(self) -> int:
        return self.m_raw.shape[0]

    @property
    def kth(self) -> jax.Array:
        return self.nbr[:, -1]


def build_dense_graph(x: jax.Array, k: int, epsilon="auto") -> DenseGraph:
    n = x.shape[0]
    d2 = pairwise_dist2(x, x)
    nbr, dist2 = knn(x, k, d2=d2)

    rows = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    m_raw = jnp.zeros((n, n), dtype=x.dtype).at[rows,
                                                nbr.reshape(-1)].set(1.0)

    if isinstance(epsilon, str):
        if epsilon != "auto":
            raise ValueError(f"epsilon must be 'auto' or a float, got {epsilon!r}")
        # floored like the edge path (see ops/graph.py) to keep the op total
        # on degenerate (collapsed-feature) inputs
        eps = jnp.maximum(jnp.sqrt(dist2[:, -1]), 1e-6)
    else:
        eps = jnp.full((n,), float(epsilon), dtype=x.dtype)
    return DenseGraph(m_raw=m_raw, d2=d2, eps=eps, nbr=nbr)


def _pallas_enabled(use_pallas: str) -> bool:
    """'on'/'off'/'auto' — auto enables the Pallas kernels on TPU backends
    only (the interpreter fallback on CPU is slower than plain XLA)."""
    if use_pallas == "on":
        return True
    if use_pallas == "off":
        return False
    return jax.default_backend() == "tpu"


def dense_affinity(g: DenseGraph, x: jax.Array | None = None,
                   use_pallas: str = "off") -> tuple[jax.Array, jax.Array]:
    """W and V as dense masked matrices (reference GLL.py:216-217).

    With ``use_pallas`` enabled (and ``x`` provided) W comes from the fused
    Pallas distance+affinity kernel (ops/kernels/affinity.py) — one kernel
    instead of the multi-pass XLA formulation; V is one elementwise op on W.
    """
    inv = 1.0 / (g.eps[:, None] * g.eps[None, :])
    if x is not None and _pallas_enabled(use_pallas):
        from .kernels.affinity import fused_affinity_sym

        w = fused_affinity_sym(x.astype(jnp.float32),
                               g.eps.astype(jnp.float32),
                               g.m_raw.astype(jnp.float32)).astype(x.dtype)
    else:
        w = jnp.exp(-4.0 * g.d2 * inv) * g.mask
    v = -8.0 * w * inv
    return w, v


def dense_forward(g: DenseGraph, y: jax.Array, tau: float,
                  x: jax.Array | None = None, use_pallas: str = "off"):
    """Solve (Luu + tau I) P = W_ul Y with one Cholesky; returns
    (pred, (w, deg, chol))."""
    import jax.scipy.linalg as jsl

    k_lab = y.shape[0]
    w, _ = dense_affinity(g, x, use_pallas)
    deg = jnp.sum(w, axis=1)
    luu = (jnp.diag(deg[k_lab:] + jnp.asarray(tau, w.dtype))
           - w[k_lab:, k_lab:])
    rhs = w[k_lab:, :k_lab] @ y
    chol = jsl.cholesky(luu, lower=True)
    pred = jsl.cho_solve((chol, True), rhs)
    return pred, (w, deg, chol)


def dense_backward(g: DenseGraph, y, pred, x, chol, gbar, auto_eps: bool,
                   w: jax.Array | None = None, use_pallas: str = "off"):
    """Implicit-diff input gradient, all-matmul formulation.  Pass the
    forward's affinity ``w`` to reuse it (V is one elementwise op on W)."""
    import jax.scipy.linalg as jsl

    k_lab = y.shape[0]
    wu = jsl.cho_solve((chol, True), gbar)
    wfull = jnp.concatenate([jnp.zeros((k_lab, wu.shape[1]), wu.dtype), wu])
    f = jnp.concatenate([y.astype(pred.dtype), pred], axis=0)

    # G = W_f + W_f^T - wf 1^T - 1 wf^T on the edge mask
    wf_cross = jax.lax.dot_general(wfull, f, (((1,), (1,)), ((), ())),
                                   preferred_element_type=wfull.dtype)
    wf_self = jnp.sum(wfull * f, axis=1)
    g_mat = (wf_cross + wf_cross.T - wf_self[:, None] - wf_self[None, :])

    if w is not None:
        inv = 1.0 / (g.eps[:, None] * g.eps[None, :])
        v = -8.0 * w * inv
    else:
        _, v = dense_affinity(g, x, use_pallas)
    a = g_mat * v  # v is zero off-edge -> masking is automatic
    # Lap(A) X = deg_A * X - A @ X
    deg_a = jnp.sum(a, axis=1)
    gx = deg_a[:, None] * x - a @ x

    if auto_eps:
        # b_i = sum_j G_ij d2_ij V_ij / (2 eps_i^2)  (reference GLL.py:124-127)
        b = jnp.sum(g_mat * g.d2 * v, axis=1) / (2.0 * g.eps * g.eps)
        kth = g.kth
        xd = x[kth] - x
        gx = gx + b[:, None] * xd
        gx = gx.at[kth].add(-b[:, None] * xd)
    return gx
