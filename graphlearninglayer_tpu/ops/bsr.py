"""Block-sparse (dense-tile) form of the symmetrized KNN matrix.

The large-graph CG matvec (reference ``laplace()``, utils.py:570-593, run at
~60k nodes / k=50) is gather/scatter-bound on TPU: both the segment-sum and
the ELL-gather formulations (ops/graph.py) pay a random-access penalty of
~100x over their useful traffic (see benchmarks/probe_spmm_variants.py).
This module trades that random access for *sequential* dense reads:

  1. **Reorder** the nodes so that graph neighborhoods become index-local.
     KNN graphs over feature embeddings are cluster-structured, so a k-means
     pass over the features (a handful of Lloyd iterations — all MXU matmuls)
     followed by sorting nodes by cluster id concentrates edges near the
     diagonal.  Labeled nodes are kept first so the solver's
     labeled/unlabeled row split stays a static slice.
  2. **Densify** the symmetric union-edge matrix into (B x B) dense tiles.
     Each block-row keeps its ``smax`` *densest* tiles (ranked by edge
     count); the leftover edges — high-dimensional KNN hubs and the
     labeled-first block-row, whose edges spray across all block-columns
     (measured: they alone push the max blocks/row from ~90 to ~236 at 60k)
     — go to a flat COO overflow list applied with one small sorted
     segment-sum per matvec.  At 60k/k=50, ``smax`` = 48 covers 99.4% of
     edges in 2.75 GiB of tiles (benchmarks/probe_bsr_structure.py).
  3. Every CG **matvec** is then a batched dense matmul over the tile lists
     — pure MXU work with sequential HBM reads (forced f32 precision: the
     default bf16 matmul pass would materialize a full bf16 copy of the
     tiles AND perturb CG's recursive residual).

The zero fill inside tiles costs extra FLOPs/bytes, but on TPU a ~2 GB
sequential stream beats a ~50 MB random-access gather by an order of
magnitude.  When the data has no cluster structure the overflow fraction
explodes; callers detect that via :func:`bsr_stats` and fall back to the
segment-sum path (ops/transductive.py does this automatically).

Numerics are identical to ``sym_spmm`` up to f32 summation order: the same
union-edge values (coef-folded W, ops/graph.py) are accumulated, only in
tile order.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .graph import BatchGraph

__all__ = ["BsrPlan", "BsrMat", "kmeans", "kmeans_labels", "chain_rank",
           "bsr_plan", "bsr_plan_from_perm", "bsr_stats", "build_bsr_mat",
           "bsr_spmm", "bsr_tile_bytes"]


def kmeans(x: jax.Array, n_clusters: int, n_iter: int = 8):
    """Cluster rows of ``x`` with deterministic Lloyd k-means.

    Returns ((n,) int32 labels, (C, d) centroids).  Init = evenly strided
    rows; empty clusters keep their previous centroid.  Cost is n_iter
    (n, d) x (d, C) matmuls — negligible next to the KNN build.
    """
    n, _ = x.shape
    stride = max(n // n_clusters, 1)
    cent0 = x[::stride][:n_clusters]

    def assign(cent):
        logits = x @ cent.T - 0.5 * jnp.sum(cent * cent, axis=1)
        return jnp.argmax(logits, axis=1).astype(jnp.int32)

    def step(cent, _):
        a = assign(cent)
        sums = jax.ops.segment_sum(x, a, num_segments=n_clusters)
        cnt = jax.ops.segment_sum(jnp.ones((n,), x.dtype), a,
                                  num_segments=n_clusters)
        new = jnp.where(cnt[:, None] > 0,
                        sums / jnp.maximum(cnt, 1.0)[:, None], cent)
        return new, None

    cent, _ = jax.lax.scan(step, cent0, None, length=n_iter)
    return assign(cent), cent


def kmeans_labels(x: jax.Array, n_clusters: int, n_iter: int = 8) -> jax.Array:
    """Cluster labels only (see :func:`kmeans`)."""
    return kmeans(x, n_clusters, n_iter)[0]


def chain_rank(cent: jax.Array) -> jax.Array:
    """Similarity rank of clusters: a greedy nearest-neighbor chain over
    the centroids, so that clusters with ADJACENT ranks are close in
    feature space.  Sorting nodes by ``chain_rank(cent)[labels]`` instead
    of raw (arbitrary) k-means ids keeps same-region subclusters in the
    same contiguous row range — BSR tiles concentrate near the diagonal
    and the edge-shard halo shrinks (same-class subclusters with distant
    raw ids would otherwise land on different shards).

    (C,) int32: rank[c] = position of cluster c along the chain.  Pure
    device code (lax.scan over C-1 argmin steps on the (C, C) distance
    matrix — trivial next to the k-means matmuls).
    """
    c = cent.shape[0]
    d2 = (jnp.sum(cent * cent, axis=1)[:, None]
          + jnp.sum(cent * cent, axis=1)[None, :]
          - 2.0 * cent @ cent.T)
    d2 = d2 + jnp.where(jnp.eye(c, dtype=bool), jnp.inf, 0.0)

    def step(carry, _):
        cur, used = carry
        row = jnp.where(used, jnp.inf, d2[cur])
        nxt = jnp.argmin(row).astype(jnp.int32)
        return (nxt, used.at[nxt].set(True)), nxt

    used0 = jnp.zeros((c,), bool).at[0].set(True)
    (_, _), seq = jax.lax.scan(step, (jnp.asarray(0, jnp.int32), used0),
                               None, length=c - 1)
    order = jnp.concatenate([jnp.zeros((1,), jnp.int32), seq])
    return jnp.zeros((c,), jnp.int32).at[order].set(
        jnp.arange(c, dtype=jnp.int32))


class BsrPlan(NamedTuple):
    """Device-side artifacts of the reorder + block-discovery pass.

    Produced by :func:`bsr_plan`; consumed by :func:`build_bsr_mat`.  Only
    the slot histogram (:func:`bsr_stats`) ever crosses to the host (it
    sizes the static slot / overflow budgets).

    No large sort is involved anywhere: per-tile edge counts come from one
    segment-sum keyed by the (dense, R^2-bounded) block key, and the
    densest-first slot ranking is a lexsort over that *tile-count* array —
    ~R^2 elements, thousands of times smaller than the edge list (XLA sorts
    are bitonic; sorting the 2 n k edge list costs seconds on TPU).

    Attributes:
      gp:         the node-permuted graph (labeled rows first, then
                  cluster-sorted unlabeled rows).
      perm, inv:  (n,) permutation old->slot and its inverse.
      slot_of:    (R*R + 1,) int32 — for every possible tile key
                  ``bi * R + bj``: the tile's rank within its block-row
                  when ranked by edge count descending (densest tile = 0;
                  empty tiles rank after all nonempty ones; the final
                  sentinel entry maps masked edges out of range).
      tile_count: (R*R + 1,) int32 — edges per tile (0 for empty tiles).
      max_blocks: () int32 — max number of distinct nonzero block-columns
                  in any block-row.
    """

    gp: BatchGraph
    perm: jax.Array
    inv: jax.Array
    slot_of: jax.Array
    tile_count: jax.Array
    max_blocks: jax.Array


class BsrMat(NamedTuple):
    """Densified symmetric matrix: per-block-row dense tiles + COO overflow.

    tiles:     (R, B, smax, B) — tiles[r, i, s, j] = A[r*B+i, cols[r,s]*B+j].
    colblocks: (R, smax) int32 — block-column of each slot; sentinel ``R``
               (a zero block of the iterate) on unused slots.
    ovf_dst/ovf_src/ovf_val: (E_ovf,) COO entries beyond the slot budget,
               sorted by dst; dst == n and val == 0 on padding entries.
    """

    tiles: jax.Array
    colblocks: jax.Array
    ovf_dst: jax.Array
    ovf_src: jax.Array
    ovf_val: jax.Array


def _both_orientations(gp: BatchGraph):
    """(rows, cols, ok) over both orientations of every directed edge."""
    n, k = gp.nbr.shape
    src = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    dst = gp.nbr.reshape(-1)
    ok = gp.coef.reshape(-1) > 0
    return (jnp.concatenate([src, dst]), jnp.concatenate([dst, src]),
            jnp.concatenate([ok, ok]))


def _finish_plan(g: BatchGraph, perm: jax.Array, block: int) -> BsrPlan:
    """Tile discovery for a given node permutation (traceable body shared
    by :func:`bsr_plan` and :func:`bsr_plan_from_perm`)."""
    n = g.nbr.shape[0]
    r_blk = -(-n // block)
    n_tiles = r_blk * r_blk
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32))
    gp = BatchGraph(nbr=inv[g.nbr[perm]], dist2=g.dist2[perm],
                    coef=g.coef[perm], eps=g.eps[perm])

    rows, cols, ok = _both_orientations(gp)
    key = jnp.where(ok, (rows // block) * r_blk + cols // block,
                    n_tiles).astype(jnp.int32)
    tile_count = jax.ops.segment_sum(
        jnp.ones_like(key), key, num_segments=n_tiles + 1
    ).at[n_tiles].set(0)

    # densest-first rank of every tile within its block-row, computed over
    # the small (R^2,) tile array (numpy lexsort order: last key is primary)
    trow = jnp.arange(n_tiles, dtype=jnp.int32) // r_blk
    order_t = jnp.lexsort((jnp.arange(n_tiles), -tile_count[:n_tiles], trow))
    pos = jnp.zeros((n_tiles,), jnp.int32).at[order_t].set(
        jnp.arange(n_tiles, dtype=jnp.int32))
    slot_of = jnp.concatenate(
        [pos - trow * r_blk,                       # rows are length-R groups
         jnp.full((1,), r_blk, jnp.int32)])        # sentinel: masked edges
    per_row = jax.ops.segment_sum(
        (tile_count[:n_tiles] > 0).astype(jnp.int32), trow,
        num_segments=r_blk)
    return BsrPlan(gp=gp, perm=perm, inv=inv, slot_of=slot_of,
                   tile_count=tile_count, max_blocks=jnp.max(per_row))


@partial(jax.jit, static_argnums=(2, 3, 4))
def bsr_plan(x: jax.Array, g: BatchGraph, k_lab: int, n_clusters: int,
             block: int) -> BsrPlan:
    """Cluster-reorder the graph and discover its nonzero block structure.

    Nodes sort by the similarity-chained cluster rank (not the arbitrary
    k-means ids): adjacent row ranges stay feature-space coherent, so
    edges concentrate near the block diagonal."""
    n = g.nbr.shape[0]
    cluster, cent = kmeans(x, n_clusters)
    key = chain_rank(cent)[cluster]
    unlabeled = (jnp.arange(n, dtype=jnp.int32) >= k_lab).astype(jnp.int32)
    perm = jnp.argsort(key + n_clusters * unlabeled, stable=True)
    return _finish_plan(g, perm.astype(jnp.int32), block)


@partial(jax.jit, static_argnums=(2,))
def bsr_plan_from_perm(g: BatchGraph, perm: jax.Array,
                       block: int) -> BsrPlan:
    """Tile discovery under a CACHED node permutation — skips the k-means
    clustering pass entirely (cross-eval amortization: trained features
    drift slowly between eval epochs, so last eval's cluster ordering still
    concentrates edges near the diagonal; the caller falls back to a fresh
    :func:`bsr_plan` when the overflow fraction says otherwise).  Exact for
    ANY permutation — only the overflow fraction degrades with staleness."""
    return _finish_plan(g, jnp.asarray(perm, jnp.int32), block)


@partial(jax.jit, static_argnums=(1,))
def bsr_stats(plan: BsrPlan, block: int):
    """Histogram of valid edges per tile slot — (R,) int32.

    ``hist[s]`` = number of symmetric-matrix entries living in the s-th
    densest tile of their block-row.  Lets the host pick the slot budget
    from the coverage curve (cumsum) in one device call, with the exact
    overflow count for any budget following as ``total - cumsum[smax-1]``.
    """
    n = plan.gp.nbr.shape[0]
    r_blk = -(-n // block)
    n_tiles = r_blk * r_blk
    return jax.ops.segment_sum(
        plan.tile_count[:n_tiles],
        jnp.minimum(plan.slot_of[:n_tiles], r_blk),
        num_segments=r_blk + 1)[:r_blk]


def bsr_tile_bytes(n: int, block: int, smax: int, itemsize: int = 4) -> int:
    """HBM bytes the densified tile array would occupy."""
    r_blk = -(-n // block)
    return r_blk * block * smax * block * itemsize


def build_bsr_mat(plan: BsrPlan, vals: jax.Array, block: int, smax: int,
                  ovf_cap: int) -> BsrMat:
    """Densify symmetric union-edge values (traceable; smax/ovf_cap static).

    vals: (n, k) per-directed-edge symmetric values (NOT coef-folded —
    folding happens here, matching sym_spmm).  Requires ``ovf_cap >=``
    the overflow count from :func:`bsr_stats`; edges beyond both budgets
    would be silently dropped, so callers must size from the plan.
    """
    gp = plan.gp
    n = gp.nbr.shape[0]
    r_blk = -(-n // block)
    n_tiles = r_blk * r_blk
    cw = (gp.coef * vals).reshape(-1)
    rows, cols, ok = _both_orientations(gp)
    v = jnp.concatenate([cw, cw])
    key = jnp.where(ok, (rows // block) * r_blk + cols // block,
                    n_tiles).astype(jnp.int32)
    slot = plan.slot_of[key]                       # r_blk on masked edges
    ubi = jnp.where(ok, rows // block, r_blk)
    in_cap = slot < smax

    # masked edges have ubi == R, beyond-budget edges slot >= smax
    # -> out of bounds -> dropped
    tiles = jnp.zeros((r_blk, block, smax, block), vals.dtype).at[
        ubi, rows % block, slot, cols % block].add(v, mode="drop")
    # one colblocks entry per TILE, from the small (R^2,) plan arrays
    tkey = jnp.arange(n_tiles, dtype=jnp.int32)
    colblocks = jnp.full((r_blk, smax), r_blk, jnp.int32).at[
        tkey // r_blk,
        jnp.where(plan.tile_count[:n_tiles] > 0, plan.slot_of[:n_tiles],
                  n_tiles)].set(tkey % r_blk, mode="drop")

    if ovf_cap > 0:
        over = ok & ~in_cap
        # pack overflow edges, then sort the small packed list by
        # destination row (for the matvec's sorted segment-sum)
        pos = jnp.cumsum(over.astype(jnp.int32)) - 1
        pos = jnp.where(over, pos, ovf_cap)
        p_dst = jnp.full((ovf_cap + 1,), n, jnp.int32).at[pos].set(
            rows.astype(jnp.int32), mode="drop")[:ovf_cap]
        p_src = jnp.zeros((ovf_cap + 1,), jnp.int32).at[pos].set(
            cols.astype(jnp.int32), mode="drop")[:ovf_cap]
        p_val = jnp.zeros((ovf_cap + 1,), vals.dtype).at[pos].set(
            jnp.where(over, v, 0), mode="drop")[:ovf_cap]
        o = jnp.argsort(p_dst)
        ovf_dst, ovf_src, ovf_val = p_dst[o], p_src[o], p_val[o]
    else:
        ovf_dst = ovf_src = jnp.zeros((0,), jnp.int32)
        ovf_val = jnp.zeros((0,), vals.dtype)
    return BsrMat(tiles=tiles, colblocks=colblocks, ovf_dst=ovf_dst,
                  ovf_src=ovf_src, ovf_val=ovf_val)


def bsr_spmm(mat: BsrMat, p: jax.Array, n: int) -> jax.Array:
    """A @ p over the tile structure; p: (n, l) -> (n, l).

    One block-granular take of the iterate (B-row slices — large enough that
    TPU tile padding is negligible) followed by a batched (B, smax*B) x
    (smax*B, l) matmul per block-row.  Both operands present their
    contraction dim innermost, so XLA lowers this straight to MXU matmuls
    with sequential HBM streaming of the tiles.  Overflow (hub / labeled-row)
    edges are applied with one small sorted segment-sum.
    """
    r_blk, b, smax, _ = mat.tiles.shape
    l = p.shape[1]
    xp = jnp.pad(p, ((0, r_blk * b - n), (0, 0)))
    xt = xp.T.reshape(l, r_blk, b)
    xt = jnp.concatenate([xt, jnp.zeros((l, 1, b), xp.dtype)], axis=1)
    gathered = jnp.take(xt, mat.colblocks, axis=1)      # (l, R, smax, B)
    out = jax.lax.dot_general(
        mat.tiles.reshape(r_blk, b, smax * b),
        gathered.reshape(l, r_blk, smax * b),
        dimension_numbers=(((2,), (2,)), ((0,), (1,))),
        precision=jax.lax.Precision.HIGHEST,
    )                                                   # (R, B, l)
    out = out.reshape(r_blk * b, l)[:n]
    if mat.ovf_dst.shape[0]:
        contrib = mat.ovf_val[:, None] * p[mat.ovf_src]
        out = out + jax.ops.segment_sum(contrib, mat.ovf_dst,
                                        num_segments=n,
                                        indices_are_sorted=True)
    return out
