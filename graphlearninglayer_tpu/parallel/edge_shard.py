"""Edge-partitioned graph parallelism: cluster-sharded build + halo-exchange CG.

This is the scaling path SURVEY.md §5/§7 calls for on large transductive
graphs (reference utils.py:637-651 at 60k+ nodes): unlike
``parallel/graph_shard.py`` (which builds the graph replicated and
all-gathers the full (n, l) iterate every matvec), here

  * the KNN build runs INSIDE the mesh — each device computes the distance
    panel + top-k for its own row block only (the O(n^2 d / P) dominant
    build cost is divided across chips), and
  * the CG matvec exchanges ONLY the halo: nodes are permuted so each
    shard owns a geometrically coherent cluster region, each shard's slot
    lists reference mostly local rows, and the few remote columns a shard
    needs are fetched per iteration with one ``lax.all_to_all`` over a
    precomputed, static-shape request table.  Per-device working set is
    O(n/P + halo) instead of O(n).

Layout pipeline:

  1. cluster permutation (device k-means + chain_rank ordering of the
     clusters, computed locally in the plan stage) so contiguous row
     chunks are geographically coherent -> halo stays small, and adjacent
     shards hold adjacent clusters -> halo traffic rides neighbor links.
  2. sharded exact KNN (shard_map: queries row-sharded, corpus replicated —
     features are O(n d), tiny next to the O(n^2) panel work).
  3. host-side plan (numpy, one-time per graph): symmetrization
     coefficients, affinities, per-shard sorted edge lists remapped into
     a [local rows | halo buffer] id space, halo request tables, Jacobi
     diagonal, preconditioned RHS.
  4. device CG (shard_map): ``stable_conjgrad`` semantics (masked
     per-column updates, GLL.py:247-276) with (l,)-sized psum reductions;
     each matvec = one all_to_all halo refresh + a flat (l, E) gather and
     sorted segment-sum over the local edge list — the same transposed
     layout the single-chip 'sorted' solver measured fastest
     (ops/transductive.py; the earlier (n_loc, S) slot-grid gather put
     the slot count in the lane dimension and ran ~10x slower per edge).

Static shapes throughout: edge cap and halo cap are bucketed per graph so
repeated solves of similar graphs reuse the compiled program.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["sharded_knn", "edge_sharded_transductive_laplace",
           "EdgeShardPlan", "build_edge_shard_plan"]


def _bucket(v: int, m: int) -> int:
    return max(-(-int(v) // m) * m, m)


def _spans_processes(mesh: Mesh) -> bool:
    """True when the mesh includes devices of OTHER processes (multi-host
    production runs): inputs must then be GLOBAL arrays and outputs must be
    all-gathered so every process can address its replica."""
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def _globalize(mesh: Mesh, spec: P, a):
    """Host array -> global array over ``mesh`` (every process holds the
    identical full copy, so any addressable shard is a slice of it)."""
    from jax.sharding import NamedSharding
    a = np.asarray(a)
    return jax.make_array_from_callback(
        a.shape, NamedSharding(mesh, spec), lambda idx: a[idx])


def sharded_knn(mesh: Mesh, x, k: int, axis: str = "graph",
                block: int = 2048, gather_out: bool = False):
    """Exact KNN with the row/query dimension sharded over ``axis``.

    Each device computes the |q|^2 + |x|^2 - 2 q x^T panel and top-k for its
    own row block (in ``block``-row tiles), against a replicated corpus.
    Returns (nbr, dist2), both (n, k), row-sharded.  n must be divisible by
    the axis size.  ``gather_out`` returns them REPLICATED instead (one
    all_gather at the end) — required when ``mesh`` spans processes and the
    host plan needs the full lists on every process.
    """
    n, d = x.shape
    nd = mesh.shape[axis]
    if n % nd:
        raise ValueError(f"n={n} not divisible by axis size {nd}")
    return _sharded_knn_impl(x, mesh=mesh, axis=axis, k=k, block=block,
                             gather_out=gather_out)


# Module-level jitted impl: jit caching is keyed on the FUNCTION IDENTITY
# plus static args, so the compiled program is reused across calls with the
# same (mesh, axis, k, block) and shapes — a per-call jitted closure would
# retrace and recompile every invocation (CLAUDE.md; 30s-6min per compile
# through the remote relay).
@partial(jax.jit, static_argnames=("mesh", "axis", "k", "block",
                                   "gather_out"))
def _sharded_knn_impl(x, *, mesh, axis, k, block, gather_out=False):
    n, d = x.shape
    nd = mesh.shape[axis]
    n_loc = n // nd
    out_spec = P(None, None) if gather_out else P(axis, None)

    # gather_out: the all_gather'd outputs ARE replicated, but the static
    # varying-mesh-axes check cannot infer that — disable it for this case
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(None, None)),
             out_specs=(out_spec, out_spec),
             **({"check_vma": False} if gather_out else {}))
    def _knn(xq, xall):
        row0 = jax.lax.axis_index(axis) * n_loc
        xx_all = jnp.sum(xall * xall, axis=-1)
        blk = min(block, n_loc)
        pad = (-n_loc) % blk
        xq_p = jnp.pad(xq, ((0, pad), (0, 0)))
        nblocks = (n_loc + pad) // blk
        rows = row0 + jnp.arange(n_loc + pad, dtype=jnp.int32)

        def one_block(args):
            xb, rb = args
            qq = jnp.sum(xb * xb, axis=-1)
            cross = jax.lax.dot_general(
                xb, xall, (((1,), (1,)), ((), ())),
                preferred_element_type=xb.dtype)
            d2 = jnp.maximum(qq[:, None] + xx_all[None, :] - 2.0 * cross, 0.0)
            is_self = rb[:, None] == jnp.arange(n, dtype=jnp.int32)[None, :]
            d2 = jnp.where(is_self, -1.0, d2)
            neg_top, idx = jax.lax.top_k(-d2, k)
            return idx.astype(jnp.int32), jnp.maximum(-neg_top, 0.0)

        idx, dist2 = jax.lax.map(
            one_block, (xq_p.reshape(nblocks, blk, d),
                        rows.reshape(nblocks, blk)))
        idx = idx.reshape(-1, k)[:n_loc]
        dist2 = dist2.reshape(-1, k)[:n_loc]
        if gather_out:   # replicate: every process can then read the lists
            idx = jax.lax.all_gather(idx, axis, axis=0, tiled=True)
            dist2 = jax.lax.all_gather(dist2, axis, axis=0, tiled=True)
        return idx, dist2

    return _knn(x, x)


class EdgeShardPlan(NamedTuple):
    """Static per-shard solve plan (leading axis = shard).

    The local matvec is a flat sorted-edge segment-sum — the layout the
    single-chip solver measured fastest (ops/transductive.py 'sorted'
    mode; benchmarks/probe_spmm_variants.py).  The earlier (n_loc, S)
    slot-grid gather form put the slot count S in the lane dimension
    (narrow, padded) and measured ~10x fewer edges/s on the chip
    (benchmarks/probe_comm_model.py round-4 notes).

    edge_dst:  (nd, E_cap) int32 — destination LOCAL row of every
               symmetric-matrix entry owned by the shard, ascending;
               n_loc marks padding (accumulated into a dropped row).
    edge_src:  (nd, E_cap) int32 — source column in the shard-local
               [0, n_loc + nd*Hcap) id space (local rows first, then the
               halo buffer in peer-major order).
    edge_val:  (nd, E_cap) — coefficient-folded symmetric affinities
               (0 on padding).
    req_send:  tuple of (nd, cap_o) int32 arrays, one per kept ring
               offset in ``offsets``: req_send[j][p] = LOCAL row indices
               shard p sends to shard (p - offsets[j]) mod nd each matvec
               (one ppermute per kept offset).  Under the similarity
               -chained cluster ordering the halo is ring-local, so the
               per-offset caps total a small fraction of the old uniform
               (nd, nd, Hcap) all_to_all padding.
    offsets:   tuple of kept ring offsets (demand > 0), ascending.
    diag:      (nd, n_loc) — Luu diagonal (degree + tau; 0-degree on
               labeled rows' entries is irrelevant, they are masked).
    mscale:    (nd, n_loc) — Jacobi 1/sqrt(diag) on unlabeled rows, 0 on
               labeled rows.
    rhs:       (nd, n_loc, l) — preconditioned RHS  M (W_ul Y).
    stats:     dict — sizes for observability/memory accounting.
    """

    edge_dst: np.ndarray
    edge_src: np.ndarray
    edge_val: np.ndarray
    req_send: tuple
    offsets: tuple
    diag: np.ndarray
    mscale: np.ndarray
    rhs: np.ndarray
    stats: dict


def build_edge_shard_plan(nbr: np.ndarray, dist2: np.ndarray,
                          y_full: np.ndarray, labeled_pos: np.ndarray,
                          nd: int, tau: float, epsilon="auto",
                          dtype=None) -> EdgeShardPlan:
    """One-time host plan from the (already cluster-permuted) KNN lists.

    Reproduces the reference graph semantics (union symmetrization with
    dropped zero-distance edges, auto-eps = k-th NN distance floored at
    1e-6 — GLL.py:180-244) and packs, per shard, the combined out+in edge
    slots with columns remapped into the local+halo id space.

    ``y_full`` is (n, l) with one-hot rows at the ``labeled_pos`` node
    positions (arbitrary under the cluster permutation) and zeros
    elsewhere.
    """
    n, k = nbr.shape
    l = y_full.shape[1]
    if n % nd:
        raise ValueError(f"n={n} not divisible by nd={nd}")
    n_loc = n // nd
    dtype = dtype or dist2.dtype
    rows = np.repeat(np.arange(n, dtype=np.int64), k)
    cols = nbr.reshape(-1).astype(np.int64)
    d2 = dist2.reshape(-1).astype(np.float64)

    valid = (cols != rows) & (d2 > 0.0)
    # reciprocal detection: undirected key appearing twice -> coef 0.5
    u = np.minimum(rows, cols)
    v = np.maximum(rows, cols)
    key = u * n + v
    key_v = np.where(valid, key, -1)
    _, inv, counts = np.unique(key_v, return_inverse=True,
                               return_counts=True)
    coef = np.where(valid, np.where(counts[inv] > 1, 0.5, 1.0), 0.0)

    if isinstance(epsilon, str):
        if epsilon != "auto":
            raise ValueError(f"epsilon must be 'auto' or float: {epsilon!r}")
        eps = np.maximum(np.sqrt(dist2[:, -1].astype(np.float64)), 1e-6)
    else:
        eps = np.full(n, float(epsilon))
    w = np.exp(-4.0 * d2 / (eps[rows] * eps[cols]))
    c = (coef * w)  # folded symmetric edge value per directed edge

    # degrees of the symmetric matrix (bincount: ~10x np.add.at)
    deg = (np.bincount(rows, weights=c, minlength=n)
           + np.bincount(cols, weights=c, minlength=n))

    # RHS b = A @ y_full: y_full is nonzero only on the ~k_lab labeled
    # rows, so only edges touching a labeled endpoint contribute — reduce
    # to that tiny subset before scattering
    b = np.zeros((n, l))
    lab_mask = y_full.any(axis=1)
    sel = lab_mask[cols]
    np.add.at(b, rows[sel], c[sel, None] * y_full[cols[sel]])
    sel = lab_mask[rows]
    np.add.at(b, cols[sel], c[sel, None] * y_full[rows[sel]])

    diag = deg + float(tau)
    unlab = np.ones(n, bool)
    unlab[np.asarray(labeled_pos, np.int64)] = False
    mscale = np.where(unlab, 1.0 / np.sqrt(diag + 1e-10), 0.0)
    rhs = mscale[:, None] * b

    # ---- combined symmetric edge list (both halves), per-shard ----------
    idx_v = np.flatnonzero(valid)
    r_v = rows[idx_v]
    c_v = cols[idx_v]
    w_v = c[idx_v]
    dst_g = np.concatenate([r_v, c_v])      # every entry's destination row
    src_g = np.concatenate([c_v, r_v])
    val_g = np.concatenate([w_v, w_v])
    qd = dst_g // n_loc                     # owning shard of each entry

    # ---- per-shard remap into [local | halo] id space -------------------
    # One vectorized pass over the ~4nk entries:
    #   * a membership bitmap over (shard, global id) marks every remote
    #     reference — an O(E) scatter instead of an O(E log E) key sort;
    #   * flatnonzero yields the unique (q, id) pairs sorted by (q, id),
    #     and since ids sort by peer p within q, each (q, p) halo table is
    #     a contiguous segment of it;
    #   * remapping a (q, id) reference is then one O(1) table lookup.
    shard_of = lambda ids: ids // n_loc
    seen_flat = np.zeros(nd * n, bool)
    rem = shard_of(src_g) != qd
    seen_flat[qd[rem] * n + src_g[rem]] = True
    kuniq = np.flatnonzero(seen_flat)           # sorted (q*n + id) keys
    # position of any (q, id) key among the uniques, O(1) per lookup
    kpos_of = np.cumsum(seen_flat, dtype=np.int64) - 1
    kq = kuniq // n
    kid = kuniq % n
    kp = shard_of(kid)
    # per-(q, p) segment sizes and starts without another unique/sort
    seg_cnt2 = np.bincount(kq * nd + kp, minlength=nd * nd)
    seg_start2 = np.concatenate([[0], np.cumsum(seg_cnt2)[:-1]])
    pos_in_seg = (np.arange(len(kuniq), dtype=np.int64)
                  - seg_start2[kq * nd + kp])
    if not len(pos_in_seg):
        # zero cross-shard references (nd=1, or perfectly shard-aligned
        # clusters): remap_flat's branchless pos_in_seg[kpos] gather needs
        # at least one (discarded) row to index
        pos_in_seg = np.zeros(1, np.int64)
    # ---- ring-distance-tiered halo caps --------------------------------
    # Per-(q, p) demand grouped by the ring offset o = (p - q) mod nd.
    # Under the similarity-chained cluster ordering, demand is RING-LOCAL
    # (measured at 60k/k=50: nonzero only at o = +-1, +-2) — a uniform
    # per-pair cap (max over ALL pairs) padded the halo 5-10x, and the
    # matvec cost tracks exactly this extended working set
    # (benchmarks/probe_comm_model.py).  Each kept offset gets its own
    # bucketed cap; offsets with zero demand ship nothing.
    qpairs = seg_cnt2.reshape(nd, nd)
    demand = np.zeros(nd, np.int64)
    for o in range(1, nd):
        demand[o] = qpairs[np.arange(nd), (np.arange(nd) + o) % nd].max()
    offsets = tuple(int(o) for o in range(1, nd) if demand[o] > 0)

    def _hbucket(v):
        # ~20% headroom then a coarse bucket, so run-to-run jitter in the
        # halo size does not flip the static shape; small graphs keep the
        # tight exact bucket
        if v >= 256:
            return min(_bucket(v + v // 5, 64), max(n_loc, 64))
        return min(_bucket(v, 8), max(n_loc, 8))

    caps = {o: _hbucket(int(demand[o])) for o in offsets}
    # halo layout: [local rows | seg(o_1) | seg(o_2) | ...] in offset order
    base_map = np.zeros(nd, np.int64)
    acc = n_loc
    for o in offsets:
        base_map[o] = acc
        acc += caps[o]
    n_ext = int(acc)

    # per offset: reqs_o[q] = sorted PEER-LOCAL row ids q needs from
    # p = (q+o) mod nd, padded with the peer's LAST row id so rows stay
    # sorted (pads land after all real requests; any peer row id is a
    # benign fetch).  The send table the solve uses is the same array
    # re-indexed to the SENDER: req_send_o[p] = reqs_o[(p - o) mod nd].
    ko = (kp - kq) % nd
    req_send = []
    for o in offsets:
        reqs_o = np.full((nd, caps[o]), n_loc - 1, np.int64)
        sel = ko == o
        reqs_o[kq[sel], pos_in_seg[sel]] = kid[sel] - kp[sel] * n_loc
        req_send.append(
            reqs_o[(np.arange(nd) - o) % nd].astype(np.int32))
    req_send = tuple(req_send)

    def remap_flat(q_arr, ids):
        """global ids -> [0, n_ext) per-entry for shards q_arr.
        Branchless (np.where, no boolean fancy-indexing — masked gathers
        were the profile's hot spot): local-entry key lookups land on
        arbitrary kpos values that the where discards (kpos_of of an
        unseen key is the previous seen position or -1, both valid
        indices into pos_in_seg)."""
        p_of = shard_of(ids)
        kpos = kpos_of[q_arr * n + ids]
        halo = base_map[(p_of - q_arr) % nd] + pos_in_seg[kpos]
        return np.where(p_of == q_arr, ids - q_arr * n_loc,
                        halo).astype(np.int32)

    # ---- per-shard sorted edge arrays (pad dst = n_loc, dropped row) ----
    # one stable single-key sort by destination row: shards own contiguous
    # row ranges, so the sorted list is shard-major AND per-shard ascending
    # (what indices_are_sorted=True needs in the matvec's segment-sum)
    order = np.argsort(dst_g, kind="stable")
    dst_s = dst_g[order]
    src_s = src_g[order]
    val_s = val_g[order]
    q_s = qd[order]
    cnt_q = np.bincount(q_s, minlength=nd)
    e_max = int(cnt_q.max()) if len(dst_s) else 1
    # ~20% headroom then a coarse bucket so run-to-run jitter in the edge
    # count does not flip the static shape (the ELL/BSR cap policy)
    if e_max >= 4096:
        e_cap = _bucket(e_max + e_max // 5, 16384)
    else:
        e_cap = _bucket(e_max, 256)
    start_q = np.zeros(nd + 1, np.int64)
    np.cumsum(cnt_q, out=start_q[1:])
    rank_q = np.arange(len(dst_s)) - start_q[q_s]
    edge_dst = np.full((nd, e_cap), n_loc, np.int32)   # n_loc = pad row
    edge_src = np.zeros((nd, e_cap), np.int32)
    edge_val = np.zeros((nd, e_cap), dtype)
    if len(dst_s):
        edge_dst[q_s, rank_q] = (dst_s - q_s * n_loc).astype(np.int32)
        edge_src[q_s, rank_q] = remap_flat(q_s, src_s)
        edge_val[q_s, rank_q] = val_s.astype(dtype)

    halo_used = int(len(kuniq))
    itemsize = np.dtype(dtype).itemsize
    # exact per-(q, p) halo rows actually referenced (seg_cnt2 before any
    # cap padding): the real cross-shard traffic, vs the padded static
    # ring-exchange shapes the program ships
    halo_rows_qp = seg_cnt2.reshape(nd, nd)
    halo_total = n_ext - n_loc
    stats = dict(n=n, nd=nd, n_loc=n_loc, e_cap=e_cap, n_ext=n_ext,
                 ring_caps={int(o): int(caps[o]) for o in offsets},
                 halo_used=halo_used,
                 halo_frac=halo_used / max(nd * n, 1),
                 # per-matvec working set (rows touched per device) vs the
                 # replicated all-gather design's n rows
                 rows_per_device=n_ext,
                 sharded_bytes=int(edge_dst[0].nbytes + edge_src[0].nbytes
                                   + edge_val[0].nbytes
                                   + n_ext * l * itemsize),
                 replicated_bytes=int(edge_dst.nbytes + edge_src.nbytes
                                      + edge_val.nbytes
                                      + n * l * itemsize),
                 # ---- per-CG-iteration communication volume (one matvec
                 # per iteration; the two psum reductions move (l,) scalars
                 # and are negligible).  Each device SENDS (and receives)
                 # the padded ring segments:
                 a2a_bytes_per_device=int(halo_total * l * itemsize),
                 # real (unpadded) halo rows needed per device, and the max
                 # over (q, p) pairs
                 halo_rows_max_pair=int(halo_rows_qp.max())
                 if len(kuniq) else 0,
                 halo_rows_qp=halo_rows_qp.tolist(),
                 # local compute per device per matvec: edge-list bytes
                 # streamed (ids + values) + iterate gather
                 matvec_bytes_per_device=int(
                     edge_dst[0].nbytes + edge_src[0].nbytes
                     + edge_val[0].nbytes + n_ext * l * itemsize))
    return EdgeShardPlan(edge_dst, edge_src, edge_val, req_send, offsets,
                         diag.reshape(nd, n_loc).astype(dtype),
                         mscale.reshape(nd, n_loc).astype(dtype),
                         rhs.reshape(nd, n_loc, l).astype(dtype), stats)


def edge_sharded_solve(mesh: Mesh, plan: EdgeShardPlan, axis: str = "graph",
                       tol: float = 1e-10, max_iter: int = 100_000,
                       x0=None):
    """Halo-exchange CG over the per-shard plan.

    Returns (M z of shape (n, l), iters, final_err) — same convergence
    surface as ``stable_conjgrad(return_info=True)`` so callers can warn on
    non-convergence like the single-device path.  ``stable_conjgrad``
    semantics and the reference's max_iter=1e5 default (GLL.py:247-276);
    every matvec refreshes the halo with ring-tiered ppermutes and reduces
    locally over the sorted edge lists.

    ``x0``: optional warm start in PREDICTION space, (nd, n_loc, l) in the
    plan's permuted row layout — the solve still runs to ``tol``.
    """
    nd, n_loc = plan.diag.shape
    l = plan.rhs.shape[2]
    if _spans_processes(mesh):
        # multi-process: shard_map inputs must be GLOBAL arrays; every
        # process holds the identical host plan, so globalize by slicing.
        # The solution comes back all-gathered (replicated) so each
        # process can read it for the host-side unpermute.
        conv = lambda a: _globalize(mesh, P(axis, *([None] * (a.ndim - 1))),
                                    a)
        gather_out = True
    else:
        conv = jnp.asarray
        gather_out = False
    out, iters, err = _edge_solve_impl(
        conv(plan.edge_dst), conv(plan.edge_src), conv(plan.edge_val),
        tuple(conv(r) for r in plan.req_send), conv(plan.diag),
        conv(plan.mscale), conv(plan.rhs),
        None if x0 is None else conv(np.asarray(x0, plan.rhs.dtype)),
        mesh=mesh, axis=axis,
        offsets=tuple(plan.offsets), tol=float(tol),
        max_iter=int(max_iter), gather_out=gather_out)
    return jnp.reshape(out, (nd * n_loc, l)), iters, err


# Module-level jitted impl — see _sharded_knn_impl for why (per-call jitted
# closures retrace every invocation).
@partial(jax.jit, static_argnames=("mesh", "axis", "offsets", "tol",
                                   "max_iter", "gather_out"))
def _edge_solve_impl(edge_dst_a, edge_src_a, edge_val_a, req_send_a,
                     diag_a, mscale_a, rhs_a, x0_a=None, *,
                     mesh, axis, offsets, tol, max_iter, gather_out=False):
    nd, n_loc = diag_a.shape
    l = rhs_a.shape[2]

    spec3 = P(axis, None, None)
    spec2 = P(axis, None)
    out_spec = P(None, None, None) if gather_out else spec3

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(spec2, spec2, spec2,
                       tuple(spec2 for _ in offsets), spec2, spec2, spec3,
                       None if x0_a is None else spec3),
             out_specs=(out_spec, P(), P()),
             **({"check_vma": False} if gather_out else {}))
    def solve(edge_dst, edge_src, edge_val, req_send, diag, mscale, rhs,
              x0_in):
        edge_dst, edge_src, edge_val = (edge_dst[0], edge_src[0],
                                        edge_val[0])
        req_send = tuple(r[0] for r in req_send)
        diag, mscale, b = diag[0], mscale[0], rhs[0]
        unlab = mscale > 0
        perms = [[(p, (p - o) % nd) for p in range(nd)] for o in offsets]

        def spmm(p_loc):
            # ring-tiered halo refresh: for each kept offset o, send the
            # rows peer (p - o) requested with one ppermute — total halo
            # bytes are the small per-offset caps, not a uniform
            # (nd, hcap) all_to_all pad (demand is ring-local under the
            # chained cluster ordering)
            parts = [p_loc]
            for req, perm in zip(req_send, perms):
                parts.append(jax.lax.ppermute(p_loc[req], axis, perm))
            xa = jnp.concatenate(parts, axis=0)
            # transposed (l, E) layout + sorted segment-sum — the fast
            # single-chip 'sorted' matvec form (ops/transductive.py):
            # minor dims stay wide and fully packed; the narrow-lane
            # (n_loc, S) slot-gather form measured ~10x slower per edge
            xt = xa.T                                    # (l, n_ext)
            contrib = edge_val[None] * jnp.take(xt, edge_src, axis=1)
            out_t = jnp.zeros((l, n_loc + 1), xt.dtype).at[:, edge_dst].add(
                contrib, indices_are_sorted=True)        # pad row = n_loc
            return out_t[:, :n_loc].T

        def matvec(p):
            q = mscale[:, None] * p
            wq = spmm(q)
            return ((mscale * diag * mscale)[:, None] * p
                    - mscale[:, None] * wq * unlab[:, None].astype(p.dtype))

        def gsum(vv):
            return jax.lax.psum(jnp.sum(vv, axis=0), axis)

        tol_a = jnp.asarray(tol, b.dtype)
        if x0_in is None:
            z0 = jnp.zeros_like(b)
        else:
            # warm start arrives in PREDICTION space (pred = M z):
            # z = pred / mscale on unlabeled rows, 0 on labeled/padding
            z0 = jnp.where(unlab[:, None],
                           x0_in[0] / jnp.where(unlab, mscale, 1.0)[:, None],
                           0.0).astype(b.dtype)
        r0 = b - matvec(z0)
        rs0 = gsum(r0 * r0)

        def cond(state):
            _, _, _, _, err, i = state
            return (err > tol_a) & (i < max_iter)

        def body(state):
            xk, r, p, rsold, _, i = state
            ap = matvec(p)
            pap = gsum(p * ap)
            live = rsold > tol_a * tol_a
            alpha = jnp.where(live, rsold / jnp.where(live, pap, 1.0), 0.0)
            xk = xk + alpha * p
            r = r - alpha * ap
            rsnew = gsum(r * r)
            err = jnp.sqrt(jnp.max(rsnew))
            livenew = rsnew > tol_a * tol_a
            beta = jnp.where(livenew,
                             rsnew / jnp.where(livenew, rsold, 1.0), 0.0)
            p = r + beta * p
            return xk, r, p, rsnew, err, i + 1

        err0 = jnp.sqrt(jnp.max(rs0))
        z, _, _, _, err, iters = jax.lax.while_loop(
            cond, body, (z0, r0, r0, rs0, err0, jnp.asarray(0, jnp.int32)))
        out = (mscale[:, None] * z)[None]
        if gather_out:   # replicate the solution across the axis
            out = jax.lax.all_gather(out, axis, axis=0, tiled=True)
        return out, iters, err

    return solve(edge_dst_a, edge_src_a, edge_val_a, req_send_a, diag_a,
                 mscale_a, rhs_a, x0_a)


def edge_sharded_transductive_laplace(mesh: Mesh, x, y, knn_num: int = 50,
                                      epsilon="auto", tau: float = 1e-8,
                                      axis: str = "graph",
                                      knn_block: int = 2048,
                                      n_clusters: int | None = None,
                                      return_stats: bool = False,
                                      return_info: bool = False,
                                      cache=None):
    """Cluster-permuted, edge-partitioned transductive Laplace learning.

    Numerically equivalent to ``ops.transductive.transductive_laplace``
    (labeled rows 0..k_lab-1; returns (n - k_lab, l) unlabeled scores).
    The KNN build runs row-sharded on the mesh; the CG runs with halo
    exchange only.  Node count is padded with far-away dummy nodes to a
    multiple of the axis size (their affinities underflow to zero).
    """
    n_real = x.shape[0]
    k_lab = y.shape[0]
    nd = mesh.shape[axis]
    pad = (-n_real) % nd
    multiproc = _spans_processes(mesh)
    if multiproc:
        # multi-process: the permutation/plan stages are host-side anyway;
        # pull the (replicated or process-local) features to host once,
        # run k-means as a LOCAL program (identical on every process), and
        # hand the sharded KNN a GLOBAL replicated copy.  ``x`` must be
        # host-addressable (replicated or local) — the eval path's encode
        # produces exactly that.
        x = np.asarray(jax.device_get(x))
        if pad:
            far = float(np.max(np.abs(x))) * 1e3 + 1e3
            fill = far * (1.0 + np.arange(pad, dtype=x.dtype)[:, None])
            x = np.concatenate(
                [x, np.broadcast_to(fill, (pad, x.shape[1]))], axis=0)
    else:
        x = jnp.asarray(x)
        if pad:
            far = jnp.max(jnp.abs(x)) * 1e3 + 1e3
            fill = far * (1.0 + jnp.arange(pad, dtype=x.dtype)[:, None])
            x = jnp.concatenate(
                [x, jnp.broadcast_to(fill, (pad, x.shape[1]))], axis=0)
    n = x.shape[0]

    # 1. cluster permutation: stable sort by the similarity-CHAINED
    #    cluster rank (ops/bsr.chain_rank) -> contiguous chunks are
    #    coherent regions AND adjacent chunks are neighbors in feature
    #    space, so same-region subclusters land on the same shard and the
    #    halo shrinks (arbitrary k-means ids scatter them across shards).
    #    Across a run's eval epochs the cache reuses the previous
    #    permutation (features drift slowly; any permutation is EXACT —
    #    only the halo size degrades with staleness, and the bucketed caps
    #    absorb that) — the k-means + chain pass is skipped entirely.
    cache_ok = (cache is not None and cache.matches(n_real, k_lab)
                and cache.shard_perm is not None
                and cache.shard_nd == nd
                and len(cache.shard_perm) == n)
    if cache_ok:
        perm = cache.shard_perm
    else:
        if n_clusters is None:
            n_clusters = max(nd, min(256, n // 512))
        from ..ops.bsr import chain_rank, kmeans
        labels_d, cent_d = kmeans(jnp.asarray(x) if multiproc else x,
                                  n_clusters)
        key = np.asarray(jax.device_get(chain_rank(cent_d)))[
            np.asarray(jax.device_get(labels_d))]
        perm = np.argsort(key, kind="stable").astype(np.int64)
    if multiproc:
        x_p = _globalize(mesh, P(), np.ascontiguousarray(x[perm]))
    else:
        x_p = x[jnp.asarray(perm)]

    # y rows must stay attached to their nodes: labeled node ids under the
    # permutation
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    y_np = np.asarray(y)
    y_full_rows = np.zeros((n, y_np.shape[1]), y_np.dtype)
    y_full_rows[inv[:k_lab]] = y_np

    # 2. sharded KNN build on the permuted rows (multi-process: replicated
    #    outputs so every process can read the full lists for the plan)
    nbr, dist2 = sharded_knn(mesh, x_p, knn_num, axis, knn_block,
                             gather_out=multiproc)
    nbr = np.asarray(jax.device_get(nbr))
    dist2 = np.asarray(jax.device_get(dist2))

    # 3. host plan (labeled rows sit at arbitrary permuted positions)
    plan = build_edge_shard_plan(nbr, dist2, y_full_rows, inv[:k_lab], nd,
                                 tau, epsilon, dtype=np.dtype(x_p.dtype))

    # 4. halo-exchange CG (warm-started from the cached previous eval's
    #    solution when available — still solved to tol, result unchanged)
    x0 = None
    if cache is not None:
        prev = cache.warm_start(n_real, k_lab, y_np.shape[1])
        if prev is not None:
            x0_full = np.zeros((n, y_np.shape[1]), np.float64)
            x0_full[k_lab:n_real] = np.asarray(jax.device_get(prev))
            n_loc = n // nd
            x0 = x0_full[perm].reshape(nd, n_loc, y_np.shape[1])
    out, iters, err = edge_sharded_solve(mesh, plan, axis, x0=x0)
    out = np.asarray(jax.device_get(out))          # (n, l), permuted rows
    if float(np.asarray(err)) > 1e-10:             # reference GLL.py:273-274
        print(f"max iter reached:  {int(iters)}  iters")

    # unpermute; drop labeled + dummy rows
    unperm = out[inv]                              # original row order
    pred = unperm[k_lab:n_real]
    if cache is not None:
        cache.n, cache.k_lab = n_real, k_lab
        cache.shard_perm, cache.shard_nd = perm, nd
        cache.prev_pred = jnp.asarray(pred)
    if return_stats and return_info:   # (pred, plan stats, cg_iters, err)
        return (jnp.asarray(pred), plan.stats, int(np.asarray(iters)),
                float(np.asarray(err)))
    if return_stats:
        return jnp.asarray(pred), plan.stats
    if return_info:  # (pred, cg_iters, final_err) — observability parity
        # with ops.transductive.transductive_laplace(return_info=True)
        return (jnp.asarray(pred), int(np.asarray(iters)),
                float(np.asarray(err)))
    return jnp.asarray(pred)
