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
    "graph_from_knn",
    "edge_weights",
    "sym_rowsum",
    "sym_spmm",
    "dense_weight_matrix",
    "SymEll",
    "max_in_degree",
    "ell_cap",
    "build_sym_ell",
    "ell_reweight",
    "ell_rowsum",
    "ell_spmm",
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
    if tiled:
        nbr, dist2 = knn_tiled(x, k, block)
    else:
        nbr, dist2 = knn(x, k)
    return graph_from_knn(nbr, dist2, epsilon, dtype=x.dtype)


def graph_from_knn(nbr: jax.Array, dist2: jax.Array, epsilon="auto", *,
                   dtype=None) -> BatchGraph:
    """The post-KNN half of :func:`build_graph`: symmetrization coefs +
    auto-epsilon from precomputed (nbr, dist2) lists — lets an alternate
    exact KNN (e.g. the certificate-banded cross-eval build,
    ops/knn_banded.py) feed the identical graph semantics."""
    n = nbr.shape[0]
    if dtype is None:
        dtype = dist2.dtype

    # Reciprocal-edge detection: edge (i, j) is reciprocal iff i appears in
    # j's neighbor list.  nbr[nbr] has shape (n, k, k); compare against i.
    rows = jnp.arange(n, dtype=jnp.int32)
    recip = jnp.any(nbr[nbr] == rows[:, None, None], axis=-1)

    # Mask: drop self edges and exact-zero distances (reference sparse.find
    # drops explicit zeros, GLL.py:198 — coincident points carry no edge).
    valid = (nbr != rows[:, None]) & (dist2 > 0.0)
    coef = jnp.where(valid, jnp.where(recip, 0.5, 1.0), 0.0).astype(dtype)

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
        eps = jnp.full((n,), float(epsilon), dtype=dtype)

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


# ---------------------------------------------------------------------------
# ELL (padded row-major) representation of the SYMMETRIZED matrix.
#
# ``sym_spmm`` above scatter-adds the in-edge half on every call — and
# scatter-add is the slowest memory primitive on TPU (it serializes on
# colliding indices).  In the CG solve the same graph is multiplied hundreds
# of times, so we pay ONE sort/scatter to build, per row, the *combined*
# padded list of all symmetric-matrix entries of that row (its k out-edges
# plus all its in-edges).  Every subsequent matvec is then pure
# gather + multiply + row-reduction — exactly the memory access pattern TPUs
# like (dense reads, static shapes, no collisions).  This is also the natural
# sharded layout: rows (and their slots) partition cleanly across a mesh
# axis, and a matvec needs only an all-gather of the iterate.


class SymEll(NamedTuple):
    """Padded row-wise (ELL) form of the symmetric union-edge matrix, with a
    COO overflow list for hub nodes (ELL+COO hybrid).

    KNN graphs in high dimension have *hubs*: a node can appear in the
    neighbor lists of far more than k others (in-degree is unbounded), so a
    pure padded layout sized to the max in-degree can explode.  Rows hold up
    to ``cap`` incoming edges in the padded slots; the (few) edges of
    hub rows beyond the cap go to the flat overflow arrays and are applied
    with one small scatter-add.

    Attributes:
      nbr:  (n, S) int32 — column index of each slot (0 on padding slots).
      val:  (n, S) float — coefficient-folded symmetric value of the slot's
            edge (0 on padding slots), for the edge values the structure was
            built with.
      edge: (n, S) int32 — flat directed-edge id in [0, n*k) identifying the
            originating entry of the (n, k) per-edge value arrays; n*k on
            padding slots.  Enables :func:`ell_reweight` to reuse the
            structure for any other symmetric per-edge values.
      ovf_dst/ovf_src/ovf_val/ovf_edge: (E_ovf,) overflow entries
            (A[dst, src] = val); dst == n and val == 0 on padding entries.
            E_ovf may be 0 when the cap covers every row.
    """

    nbr: jax.Array
    val: jax.Array
    edge: jax.Array
    ovf_dst: jax.Array
    ovf_src: jax.Array
    ovf_val: jax.Array
    ovf_edge: jax.Array


def max_in_degree(g: BatchGraph) -> jax.Array:
    """Max over nodes of the number of *valid* incoming directed edges."""
    counts = jax.ops.segment_sum(
        (g.coef.reshape(-1) > 0).astype(jnp.int32), g.nbr.reshape(-1),
        num_segments=g.n)
    return jnp.max(counts)


def overflow_count(g: BatchGraph, cap: int) -> jax.Array:
    """Number of valid incoming edges beyond ``cap`` per-row slots, total."""
    counts = jax.ops.segment_sum(
        (g.coef.reshape(-1) > 0).astype(jnp.int32), g.nbr.reshape(-1),
        num_segments=g.n)
    return jnp.sum(jnp.maximum(counts - cap, 0))


def ell_cap(max_indeg: int, multiple: int = 32) -> int:
    """Static slot budget for the in-edge half: round up to ``multiple``.

    Bucketing bounds jit retraces when graphs of similar shape are solved
    repeatedly (the eval path is called once per eval epoch).
    """
    m = max(int(max_indeg), 1)
    return -(-m // multiple) * multiple


def build_sym_ell(g: BatchGraph, vals: jax.Array, cap: int,
                  ovf_cap: int = 0) -> SymEll:
    """Build the combined ELL(+COO) structure for symmetric values ``vals``.

    ``cap`` and ``ovf_cap`` are static.  Correctness requires that the number
    of incoming edges beyond ``cap`` per-row slots fits in ``ovf_cap``
    (i.e. ``ovf_cap >= overflow_count(g, cap)``; with
    ``cap >= max_in_degree(g)`` an ``ovf_cap`` of 0 suffices) — callers
    compute both from the graph (see ops/transductive.py).  Costs a couple of
    argsorts + one scatter; every later :func:`ell_spmm` is gather-dominated.
    """
    n, k = g.nbr.shape
    e_cnt = n * k
    c = (g.coef * vals).reshape(-1)
    src = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    dst = g.nbr.reshape(-1)
    # invalid (masked) edges sort into a discarded bucket at row n
    dst_eff = jnp.where(g.coef.reshape(-1) > 0, dst, n).astype(jnp.int32)
    order = jnp.argsort(dst_eff)
    dst_s = dst_eff[order]
    src_s = src[order]
    c_s = c[order]
    # slot rank of each edge within its destination row
    rank = (jnp.arange(e_cnt, dtype=jnp.int32)
            - jnp.searchsorted(dst_s, dst_s, side="left").astype(jnp.int32))
    row = jnp.where((dst_s < n) & (rank < cap), dst_s, n)
    rank_c = jnp.minimum(rank, cap - 1)

    in_nbr = jnp.zeros((n + 1, cap), jnp.int32).at[row, rank_c].set(src_s)[:n]
    in_val = jnp.zeros((n + 1, cap), vals.dtype).at[row, rank_c].set(c_s)[:n]
    in_edge = jnp.full((n + 1, cap), e_cnt, jnp.int32).at[row, rank_c].set(
        order.astype(jnp.int32))[:n]

    if ovf_cap > 0:
        # pack the beyond-cap edges of hub rows to the front, take ovf_cap
        over = (dst_s < n) & (rank >= cap)
        pos = jnp.arange(e_cnt, dtype=jnp.int32)
        packed = jnp.argsort(jnp.where(over, pos, e_cnt + pos))[:ovf_cap]
        ok = over[packed]
        ovf_dst = jnp.where(ok, dst_s[packed], n).astype(jnp.int32)
        ovf_src = jnp.where(ok, src_s[packed], 0).astype(jnp.int32)
        ovf_val = jnp.where(ok, c_s[packed], 0)
        ovf_edge = jnp.where(ok, order[packed].astype(jnp.int32), e_cnt)
    else:
        z = jnp.zeros((0,), jnp.int32)
        ovf_dst = ovf_src = ovf_edge = z
        ovf_val = jnp.zeros((0,), vals.dtype)

    out_edge = jnp.arange(e_cnt, dtype=jnp.int32).reshape(n, k)
    return SymEll(
        nbr=jnp.concatenate([g.nbr, in_nbr], axis=1),
        val=jnp.concatenate([(g.coef * vals), in_val], axis=1),
        edge=jnp.concatenate([out_edge, in_edge], axis=1),
        ovf_dst=ovf_dst, ovf_src=ovf_src, ovf_val=ovf_val, ovf_edge=ovf_edge,
    )


def ell_reweight(g: BatchGraph, ell: SymEll, vals: jax.Array) -> SymEll:
    """Same structure, new symmetric per-edge values (pure gather)."""
    c = (g.coef * vals).reshape(-1)
    c_pad = jnp.concatenate([c, jnp.zeros((1,), c.dtype)])
    return ell._replace(val=c_pad[ell.edge],
                        ovf_val=c_pad[ell.ovf_edge])


def ell_rowsum(ell: SymEll) -> jax.Array:
    """Row sums (degrees) of the symmetric matrix — (n,)."""
    out = jnp.sum(ell.val, axis=1)
    if ell.ovf_dst.shape[0]:
        out = out.at[ell.ovf_dst].add(ell.ovf_val, mode="drop")
    return out


def ell_spmm(ell: SymEll, x: jax.Array) -> jax.Array:
    """A @ x with A the symmetric ELL(+COO) matrix; x: (n, l) -> (n, l).

    The gather runs in transposed (l, n) layout: its output is (l, n, S)
    whose minor dims (n, S) are large, so the TPU (8, 128) tile padding is
    negligible — gathering (n, S, l) directly would pad the class dim
    l (~10) to 128 lanes, a >10x memory blowup.  Overflow (hub) edges are
    applied with one small scatter-add.  This is the CG inner-loop matvec
    (cf. the scatter-based :func:`sym_spmm`, kept for one-shot uses and as
    the numerics oracle).
    """
    xt = x.T                                   # (l, n)
    gathered = jnp.take(xt, ell.nbr, axis=1)   # (l, n, S)
    # broadcast-multiply + reduce (NOT einsum/dot_general: XLA would
    # transpose the operand to (n, S, l), re-padding l to 128 lanes)
    out = jnp.sum(ell.val[None, :, :] * gathered, axis=2).T
    if ell.ovf_dst.shape[0]:
        out = out.at[ell.ovf_dst].add(
            ell.ovf_val[:, None] * x[ell.ovf_src], mode="drop")
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
