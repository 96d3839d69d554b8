"""Exact k-nearest-neighbor search on TPU.

TPU-native replacement for the reference's Annoy approximate KNN
(`gl.weightmatrix.knnsearch(method='annoy')`, reference GLL.py:183).  The graph
sizes involved (n ~ 1.5k per training batch, up to ~60k in transductive eval)
make *exact* KNN both feasible and preferable on TPU: all-pairs squared
distances are one large MXU matmul, and top-k is a vectorized VPU reduction.
Exact KNN is deterministic, which the parity/test suite relies on.

Conventions (matching the reference):
  * Euclidean metric; the returned ``dist2`` is the *squared* distance (the
    downstream affinity only ever consumes d^2, reference GLL.py:216-218).
  * Self is always the first neighbor with distance 0 (annoy returns self
    first; reference indexes ``knn_ind[:, 0]`` as self, GLL.py:205-211).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["pairwise_dist2", "knn", "knn_tiled"]


def pairwise_dist2(x: jax.Array, y: jax.Array) -> jax.Array:
    """Squared euclidean distances between rows of ``x`` (n,d) and ``y`` (m,d).

    Uses the |x|^2 + |y|^2 - 2<x,y> expansion so the dominant cost is a single
    MXU matmul.  Clamped at zero to guard against negative round-off.
    """
    xx = jnp.sum(x * x, axis=-1)
    yy = jnp.sum(y * y, axis=-1)
    cross = jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())), preferred_element_type=x.dtype
    )
    d2 = xx[:, None] + yy[None, :] - 2.0 * cross
    return jnp.maximum(d2, 0.0)


def knn(x: jax.Array, k: int, d2: jax.Array | None = None,
        method: str = "approx") -> tuple[jax.Array, jax.Array]:
    """Exact KNN over all rows of ``x``; self included as neighbor 0.

    Returns ``(nbr, dist2)`` with shapes (n, k): ``nbr[i, 0] == i`` and the
    remaining columns are the k-1 nearest other points in ascending distance
    order.  ``dist2`` holds squared distances (``dist2[:, 0] == 0``).

    ``d2``: optionally pass a precomputed (n, n) squared-distance matrix to
    avoid recomputing it (the dense op path reuses one).

    ``method``: 'approx' (default) selects via ``lax.approx_min_k`` with
    ``recall_target=1.0`` — still exact, and faster than the sort-based
    TopK at the per-batch row widths (n <= a few thousand) this dense path
    serves; 'sort' forces ``lax.top_k``.  At transductive row widths the
    ranking inverts hard (60k-wide rows: approx_min_k(1.0) 4.8s vs top_k
    1.0s — benchmarks/probe_knn_topk.py), which is why :func:`knn_tiled`
    uses ``lax.top_k``.
    """
    n = x.shape[0]
    if d2 is None:
        d2 = pairwise_dist2(x, x)
    # Pin self strictly first regardless of float noise or coincident points.
    d2 = jnp.where(jnp.eye(n, dtype=bool), -1.0, d2)
    if method == "approx":
        dist, idx = jax.lax.approx_min_k(d2, k, recall_target=1.0)
    else:
        neg_top, idx = jax.lax.top_k(-d2, k)
        dist = -neg_top
    return idx.astype(jnp.int32), jnp.maximum(dist, 0.0)


@functools.partial(jax.jit, static_argnums=(1, 2))
def knn_tiled(x: jax.Array, k: int, block: int = 1024) -> tuple[jax.Array, jax.Array]:
    """Memory-bounded exact KNN for large n (the ~60k-node transductive path,
    reference utils.py:637-651) — never materializes the full n x n matrix.

    Processes ``block`` query rows at a time against all of ``x`` via
    ``lax.map``; peak distance-buffer memory is block*n instead of n*n.

    Selection is exact ``lax.top_k``: at these row widths it is ~5x faster
    than ``approx_min_k(recall_target=1.0)`` (which degrades to a far worse
    schedule on wide rows — measured at 60k x 60k, k=50:
    top_k 0.96s vs approx_min_k(1.0) 4.8s; benchmarks/probe_knn_topk.py).
    The distance panel itself costs only ~36ms of that — selection
    dominates.  A fused Pallas distance+running-top-k kernel was built and
    measured (ops/kernels/knn_topk.py): exact, but 1.4x SLOWER than this
    path — in-kernel bitonic selection costs more VPU passes than XLA's
    top_k at this n/k (see its docstring for the analysis); it stays
    experimental and this function remains the production path.
    """
    n, d = x.shape
    pad = (-n) % block
    xq = jnp.pad(x, ((0, pad), (0, 0)))
    nblocks = (n + pad) // block
    xx_all = jnp.sum(x * x, axis=-1)
    row_ids = jnp.arange(n + pad, dtype=jnp.int32).reshape(nblocks, block)

    def one_block(args):
        xb, rows = args  # (block, d), (block,)
        qq = jnp.sum(xb * xb, axis=-1)
        cross = jax.lax.dot_general(
            xb, x, (((1,), (1,)), ((), ())), preferred_element_type=x.dtype
        )
        d2 = jnp.maximum(qq[:, None] + xx_all[None, :] - 2.0 * cross, 0.0)
        is_self = rows[:, None] == jnp.arange(n, dtype=jnp.int32)[None, :]
        d2 = jnp.where(is_self, -1.0, d2)
        neg_top, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32), jnp.maximum(-neg_top, 0.0)

    idx, dist2 = jax.lax.map(one_block, (xq.reshape(nblocks, block, d), row_ids))
    idx = idx.reshape(-1, k)[:n]
    dist2 = dist2.reshape(-1, k)[:n]
    return idx, dist2
