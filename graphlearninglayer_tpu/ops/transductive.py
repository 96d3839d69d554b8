"""Transductive Laplace learning over large graphs (the eval path).

Equivalent of the reference's numpy ``laplace()`` (utils.py:570-593): build a
k=50 KNN graph over base + train + test features (up to ~60k nodes for
CIFAR-10, utils.py:637-651), then solve the label-propagation system with a
Jacobi-preconditioned ``stable_conjgrad``.  The reference runs this entirely
on CPU in scipy; here the KNN is a tiled MXU computation and the CG iterates
on-device over the static edge structure.

Three execution modes for the CG matvec (measured on TPU v5e at n=60k,
k=50, l=10 — benchmarks/probe_spmm_variants.py):

  * ``mode='bsr'`` (default) — cluster-reorder the nodes (on-device
    k-means), densify the symmetric matrix into dense (B x B) tiles, and
    run every CG matvec as a batched MXU matmul over the nonzero tiles
    (ops/bsr.py).  The fastest path for cluster-structured features (i.e.
    real embeddings); falls back to 'sorted' automatically when the data
    has no block structure (tile budget exceeded) or the graph is small.
  * ``mode='sorted'`` — single jit; the in-edge half is applied as
    a segment-sum over edges pre-sorted by destination (sorted once per
    graph, reused every CG iteration).  ~1.5x the scatter mode on TPU; the
    matvec runs in transposed (l, n) layout so no intermediate carries the
    class dim in the 128-lane position — flat memory to 200k+ nodes
    (120k solve 4.9->2.5 s after this fix; benchmarks/RESULTS.md).
  * ``mode='scatter'`` — the simplest single-jit path whose matvec
    scatter-adds the in-edge half each iteration.  Kept as the numerics
    oracle.
  * ``mode='ell'`` — two jitted stages: (1) graph build, (2) solve over the
    combined symmetric ELL structure (ops/graph.py, also in transposed
    layout).  Scatter-free and the layout used by the row-sharded
    multi-device solver; on one chip its (l, n, S) gather materializes
    S/k more memory per matvec than 'sorted', so 'sorted' is the
    large-graph default fallback.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .bsr import (bsr_plan, bsr_plan_from_perm, bsr_spmm, bsr_stats,
                  build_bsr_mat)
from .graph import (build_graph, build_sym_ell, edge_weights, ell_cap,
                    ell_rowsum, ell_spmm, graph_from_knn, max_in_degree,
                    overflow_count, sym_rowsum, sym_spmm)
from .knn_banded import banded_knn
from .solve import stable_conjgrad

__all__ = ["one_hot_encode", "transductive_laplace", "EvalGraphCache"]


class EvalGraphCache:
    """Cross-eval amortization state for :func:`transductive_laplace`.

    The reference rebuilds its transductive eval from scratch every eval
    epoch (utils.py:637-651); between eval epochs of one training run the
    features drift slowly, so three pieces are reusable:

      * ``perm`` — last eval's k-means cluster permutation: the BSR plan
        skips its clustering pass (``bsr_plan_from_perm``); exact for any
        permutation, with an overflow-fraction staleness check that forces
        a fresh plan when the ordering has decayed.
      * ``smax`` / ``ovf_cap`` — sticky static tile/overflow budgets: as
        long as the previous budgets still cover the new graph, reuse them
        verbatim so the solve hits the already-compiled program instead of
        recompiling on every +-1 jitter of the data-dependent shape.
      * ``prev_pred`` — last eval's solution as the CG warm start (the
        solve runs to tol=1e-10 either way, so the result is unchanged;
        only the iteration count drops).

    A cache is valid only for a fixed problem shape; any (n, k_lab, l)
    mismatch clears it.  Pass one instance across calls:

        cache = EvalGraphCache()
        for epoch ...:
            pred = transductive_laplace(x, y, ..., cache=cache)
    """

    def __init__(self):
        self.clear()

    def clear(self):
        self.n = None
        self.k_lab = None
        self.perm = None          # device (n,) int32 (BSR plan)
        self.smax = None          # sticky static slot budget
        self.ovf_cap = None       # sticky static overflow budget
        self.prev_pred = None     # device (n - k_lab, l)
        # edge-sharded eval path (parallel/edge_shard.py): its own cluster
        # permutation (host (n_padded,) int64, valid for a fixed shard
        # count) — reusing it skips the per-eval k-means + chain ordering
        self.shard_perm = None
        self.shard_nd = None
        # banded-KNN backoff: a failed certification attempt (overlapping
        # feature geometry) costs ~the banded scan; skip this many evals
        # before retrying (features drift — early-training failures often
        # become successes once clusters tighten)
        self.banded_skip = 0

    def matches(self, n: int, k_lab: int) -> bool:
        return self.n == n and self.k_lab == k_lab

    def warm_start(self, n: int, k_lab: int, l: int):
        """Previous solution if it fits this problem's shape, else None."""
        if (self.matches(n, k_lab) and self.prev_pred is not None
                and self.prev_pred.shape == (n - k_lab, l)):
            return self.prev_pred
        return None


def one_hot_encode(labels: jax.Array, n_classes: int) -> jax.Array:
    """One-hot rows for integer labels (reference utils.py:556-568)."""
    return jax.nn.one_hot(labels, n_classes, dtype=jnp.float32)


@partial(jax.jit, static_argnums=(1, 2, 3))
def _build(x, knn_num: int, epsilon, knn_block: int):
    return build_graph(x, knn_num, epsilon, tiled=True, block=knn_block)


@partial(jax.jit, static_argnums=(2,))
def _graph_from_knn(nbr, dist2, epsilon):
    return graph_from_knn(nbr, dist2, epsilon)


def _build_with_cache(x, knn_num: int, epsilon, knn_block: int,
                      cache: "EvalGraphCache | None", n: int, k_lab: int):
    """KNN graph build with cross-eval permutation reuse (VERDICT r4 item
    6).  When the cache holds last eval's cluster permutation and the
    graph is large enough for selection to dominate (the full build's
    ``lax.top_k`` over n-wide rows is ~the whole KNN cost at 60k —
    ops/knn.py), run the certificate-banded exact build steered by that
    permutation: identical (nbr, dist2) lists, ~band/n of the selection
    work, per-row ball-bound certification with bucketed full-panel
    fallback.  Anything short of a certified-exact result falls back to
    the plain tiled build.  Enable with GLL_BANDED_KNN=1."""
    # OPT-IN (GLL_BANDED_KNN=1): measured at 60k/k=50 on the standard
    # clustered benchmark geometry the ball-bound certificate is fragile —
    # 16% fallback after one 0.02-drift step, uncertifiable (>35%) after
    # two, and the band must reach ~20% of the panel before most rows
    # certify (benchmarks/probe_banded_knn.py + RESULTS.md CLOSED note).
    # It wins only on tightly separated clusters; default stays the plain
    # tiled build.
    min_n = int(os.environ.get("GLL_BANDED_MIN_N", 16384))
    use_banded = (os.environ.get("GLL_BANDED_KNN", "0") == "1"
                  and cache is not None and cache.matches(n, k_lab)
                  and cache.perm is not None and n >= min_n)
    if use_banded and cache.banded_skip > 0:
        cache.banded_skip -= 1
        use_banded = False
    if use_banded:
        perm = np.asarray(jax.device_get(cache.perm)).astype(np.int64)
        if len(perm) == n:
            nbr, dist2, frac = banded_knn(x, knn_num, perm,
                                          block=256, band=32)
            if nbr is not None:
                if os.environ.get("GLL_EVAL_DEBUG"):
                    print(f"  [banded knn: fallback_frac={frac:.3f}]",
                          flush=True)
                return _graph_from_knn(nbr, dist2, epsilon)
            # certification failed wholesale (feature geometry too
            # overlapped for the ball bounds): back off so the wasted
            # scan isn't re-paid every eval, retry as features tighten
            cache.banded_skip = 5
            if os.environ.get("GLL_EVAL_DEBUG"):
                print(f"  [banded knn: uncertifiable "
                      f"(frac={frac:.3f}), full build]", flush=True)
    return _build(x, knn_num, epsilon, knn_block)


def _finish(result, tol: float = 1e-10, return_info: bool = False):
    """Unpack (pred, iters, err) from a solve and surface the reference's
    CG non-convergence warning (GLL.py:273-274) host-side.  With
    ``return_info`` the (iters, err) pair is returned for observability
    (CG iterations are a first-class metric of the framework, SURVEY §7.1)."""
    pred, iters, err = result
    if float(np.asarray(err)) > tol:
        print(f"max iter reached:  {int(iters)}  iters")
    if return_info:
        return pred, int(np.asarray(iters)), float(np.asarray(err))
    return pred


def _jacobi_cg(matvec, deg, y, tau, k_lab, x0=None):
    """Shared solve tail: Pred = M cg(M Luu M, M (W_ul Y)) on unlabeled rows,
    M = diag(Luu)^(-1/2) (reference utils.py:584-592).

    ``x0``: optional warm start in PREDICTION space (an earlier solve's
    (m, l) output) — converted to the preconditioned variable z = x / M;
    the solve still runs to ``tol`` so the result is x0-independent.

    Returns (pred, iters, final_err) — the caller surfaces the reference's
    'not converging' warning (GLL.py:273-274) host-side, since in-jit
    prints are unavailable on this backend."""
    n = deg.shape[0]
    m = n - k_lab
    l = y.shape[1]
    y_full = jnp.concatenate([y, jnp.zeros((m, l), y.dtype)], axis=0)
    rhs = matvec(y_full)[k_lab:]                  # -Lul @ Y

    diag = deg[k_lab:] + jnp.asarray(tau, deg.dtype)
    mscale = 1.0 / jnp.sqrt(diag + 1e-10)

    def mv(p):
        p = mscale[:, None] * p
        p_full = jnp.pad(p, ((k_lab, 0), (0, 0)))
        wp = matvec(p_full)[k_lab:]
        return mscale[:, None] * (diag[:, None] * p - wp)

    z0 = None if x0 is None else x0.astype(rhs.dtype) / mscale[:, None]
    z, iters, err = stable_conjgrad(mv, mscale[:, None] * rhs, z0,
                                    return_info=True)
    return mscale[:, None] * z, iters, err


@partial(jax.jit, static_argnums=(2, 3, 4))
def _solve_ell(g, y, cap: int, ovf_cap: int, tau: float):
    w, _ = edge_weights(g)
    ell = build_sym_ell(g, w, cap, ovf_cap)
    return _jacobi_cg(lambda p: ell_spmm(ell, p), ell_rowsum(ell), y, tau,
                      y.shape[0])


@partial(jax.jit, static_argnums=(2,))
def _solve_scatter(g, y, tau: float):
    w, _ = edge_weights(g)
    return _jacobi_cg(lambda p: sym_spmm(g, w, p), sym_rowsum(g, w), y, tau,
                      y.shape[0])


@partial(jax.jit, static_argnums=(2,))
def _solve_sorted(g, y, tau: float, x0=None):
    w, _ = edge_weights(g)
    n, k = g.nbr.shape
    coefw = g.coef * w
    # one-time sort of the in-edges by destination row: every CG matvec then
    # uses a sorted segment-sum (no colliding scatter-adds)
    dst = g.nbr.reshape(-1)
    order = jnp.argsort(dst)
    dst_s = dst[order]
    src_s = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)[order]
    c_s = coefw.reshape(-1)[order]

    def matvec(p):
        # transposed (l, n) layout throughout (same fix as ell_spmm,
        # ops/graph.py): a direct p[g.nbr] / p[src_s] gather materializes
        # (n, k, l) / (E, l) intermediates whose minor class dim l (~10)
        # is lane-padded to 128 — a 12.8x memory blowup (~6 GB at n=120k)
        # that, not HBM, capped the single-chip ceiling.  Gathering the
        # transpose keeps the minor dims (n, k) / (E,) wide and fully
        # packed; broadcast-multiply + reduce instead of einsum (XLA's
        # dot_general would transpose the gathered operand back).
        # promote to the common dtype up front: with f64 features and f32
        # labels the scatter-add below would otherwise cast its f64 update
        # into a f32 buffer (a FutureWarning today, an error in future JAX)
        pt = p.T.astype(jnp.result_type(p, coefw))             # (l, n)
        out_t = jnp.sum(coefw[None] * jnp.take(pt, g.nbr, axis=1), axis=2)
        contrib_t = c_s[None, :] * jnp.take(pt, src_s, axis=1)  # (l, E)
        in_t = jnp.zeros_like(pt).at[:, dst_s].add(
            contrib_t, indices_are_sorted=True)
        return (out_t + in_t).T

    return _jacobi_cg(matvec, sym_rowsum(g, w), y, tau, y.shape[0], x0)


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _solve_bsr(plan, y, block: int, smax: int, ovf_cap: int, tau: float,
               x0=None):
    gp = plan.gp
    k_lab = y.shape[0]
    w, _ = edge_weights(gp)
    mat = build_bsr_mat(plan, w, block, smax, ovf_cap)
    deg = sym_rowsum(gp, w)
    y_perm = y[plan.perm[:k_lab]]
    # warm start arrives in ORIGINAL unlabeled row order; permuted row i
    # (i >= k_lab) holds original row perm[i], i.e. unlabeled index
    # perm[i] - k_lab (labeled rows always sort first, bsr_plan)
    x0p = None if x0 is None else x0[plan.perm[k_lab:] - k_lab]
    out, iters, err = _jacobi_cg(lambda p: bsr_spmm(mat, p, gp.n), deg,
                                 y_perm, tau, k_lab, x0p)
    # back to original (unlabeled) row order
    return out[plan.inv[k_lab:] - k_lab], iters, err


def _transductive_bsr(x, g, y, tau: float, block: int, max_tile_bytes: int,
                      cache: "EvalGraphCache | None" = None, x0=None):
    """Two-stage BSR path: plan (reorder + block discovery) -> dense-tile CG.

    ``g`` is the prebuilt KNN graph (shared with the 'sorted' fallback so a
    failed BSR attempt does not pay the ~1s build twice at 60k nodes).  The
    slot budget ``smax`` keeps each block-row's densest tiles within
    ``max_tile_bytes`` (a hard cap: if even the 8-slot minimum exceeds it we
    return None); leftover edges ride the COO overflow.  Returns None when
    the structure is hopeless (overflow majority even at full budget — data
    without cluster structure) — caller falls back to 'sorted'.

    ``cache``: cross-eval amortization (see :class:`EvalGraphCache`) —
    reuse the previous k-means permutation (skipping the clustering pass),
    the previous static budgets (skipping a recompile when the new graph
    still fits), and warm-start the CG from ``x0``.
    """
    n = x.shape[0]
    k_lab = y.shape[0]
    if n < 4 * block:
        return None
    r_blk = -(-n // block)
    budget = max_tile_bytes // (r_blk * block * block * x.dtype.itemsize)
    if budget < 8:                                 # cannot honor the cap
        return None

    cached_perm = (cache.perm if cache is not None
                   and cache.matches(n, k_lab) else None)
    dbg = (print if os.environ.get("GLL_EVAL_DEBUG")
           else (lambda *a, **k: None))

    def make_plan(perm):
        dbg(f"  [bsr: plan from_perm={perm is not None}]", flush=True)
        if perm is not None:
            plan = bsr_plan_from_perm(g, perm, block)
        else:
            n_clusters = max(8, min(512, n // 1024))
            plan = bsr_plan(x, g, k_lab, n_clusters, block)
        hist = np.asarray(jax.device_get(bsr_stats(plan, block)), np.int64)
        dbg(f"  [bsr: stats done]", flush=True)
        return plan, np.cumsum(hist)

    def _coverage(cum):
        """(total, smax_min, ovf_at, capped): smallest slot budget covering
        99% of edges, overflow for any budget, and the headroomed budget
        -capped smax the solve would actually use."""
        total = int(cum[-1])
        smax_min = int(np.searchsorted(cum, 0.99 * total) + 1)
        ovf_at = lambda s: total - int(cum[min(s, len(cum)) - 1])

        def capped(s):
            s = -(-(s + max(s // 8, 4)) // 16) * 16
            return max(min(s, int(budget) // 8 * 8, len(cum)), 1)

        return total, smax_min, ovf_at, capped

    plan, cum = make_plan(cached_perm)
    total, smax_min, ovf_at, capped = _coverage(cum)
    if (cached_perm is not None
            and ovf_at(capped(smax_min)) > 0.25 * total):
        # stale permutation: under the budget-capped slot count the cached
        # ordering no longer tiles this graph — one fresh plan before
        # giving up on the BSR path entirely
        dbg("  [bsr: cached perm stale, replanning]", flush=True)
        plan, cum = make_plan(None)
        total, smax_min, ovf_at, capped = _coverage(cum)
        cached_perm = None

    # Sticky static shapes, decided PER COMPONENT (a fresh static combo
    # means a fresh ~30s+ remote-relay compile every eval — the dominant
    # amortization target, and every compile is a small flake risk):
    #   smax:    reuse the cached slot count whenever it still covers the
    #            requirement (>= capped requirement, within budget) — in
    #            particular when both are pinned at the budget cap;
    #   ovf_cap: reuse whenever the new overflow still fits; grow with
    #            ~25% headroom (bucketed) only when it does not.
    smax_req = capped(smax_min)
    cache_ok = (cache is not None and cache.matches(n, k_lab))
    if (cache_ok and cache.smax is not None
            and smax_req <= cache.smax <= int(budget) // 8 * 8
            and cache.smax <= len(cum)):
        smax = cache.smax
    else:
        # ~20% headroom then bucketed to 16 so that run-to-run jitter in
        # the data does not flip the static shape; capped by the
        # tile-memory budget
        smax = smax_req
    ovf = ovf_at(smax)
    if ovf > 0.25 * total:                         # no block structure
        return None
    if cache_ok and cache.ovf_cap is not None and ovf <= cache.ovf_cap:
        ovf_cap = cache.ovf_cap
    else:
        ovf_cap = 0 if ovf == 0 else \
            -(-(ovf + max(ovf // 4, 2048)) // 16384) * 16384
    dbg(f"  [bsr: solve smax={smax} ovf_cap={ovf_cap} "
        f"smax_min={smax_min} total={total} warm={x0 is not None}]",
        flush=True)
    res = _solve_bsr(plan, y, block, smax, ovf_cap, float(tau), x0)
    if cache is not None:
        cache.n, cache.k_lab = n, k_lab
        cache.perm = plan.perm
        cache.smax, cache.ovf_cap = smax, ovf_cap
    return res


def transductive_laplace(x, y, knn_num: int = 50, epsilon="auto",
                         tau: float = 1e-8, knn_block: int = 2048,
                         mode: str = "bsr", ell_cap_limit: int = 512,
                         bsr_block: int = 256,
                         bsr_max_tile_bytes: int = 4 << 30,
                         return_info: bool = False,
                         cache: "EvalGraphCache | None" = None):
    """Full-dataset Laplace learning; labeled rows are 0..k_lab-1.

    x: (n, d) features; y: (k_lab, l) one-hot labels.  Returns (n - k_lab, l)
    scores for the unlabeled rows.  Mirrors reference utils.py:570-593:
    Luu + tau*I with Jacobi preconditioner M = diag^(-1/2) and
    ``Pred = M cg(M Luu M, -M Lul Y)``.

    ``return_info=True`` → (pred, cg_iters, final_err) for observability.
    ``cache``: an :class:`EvalGraphCache` shared across calls amortizes the
    per-eval rebuild (permutation reuse, sticky compiled shapes, CG warm
    start) without changing the result (solves still run to ``tol``).
    """
    epsilon = epsilon if isinstance(epsilon, str) else float(epsilon)
    if mode not in ("bsr", "sorted", "scatter", "ell"):
        raise ValueError(f"unknown mode {mode!r}")
    n, k_lab = int(x.shape[0]), int(y.shape[0])
    x0 = (cache.warm_start(n, k_lab, int(y.shape[1]))
          if cache is not None else None)

    def _done(res):
        if cache is not None:
            cache.n, cache.k_lab = n, k_lab
            cache.prev_pred = res[0]
        return _finish(res, return_info=return_info)

    g = _build_with_cache(x, knn_num, epsilon, knn_block, cache, n, k_lab)
    if mode == "bsr":
        # The BSR tile budget is data-dependent (trained features cluster
        # differently run to run); if the resulting program exceeds device
        # memory at compile/execute, degrade to 'sorted' instead of killing
        # a long training run mid-eval.
        try:
            res = _transductive_bsr(x, g, y, float(tau), bsr_block,
                                    bsr_max_tile_bytes, cache, x0)
            if res is not None:
                # Force execution INSIDE the guard: dispatch is async, so an
                # execution-time OOM would otherwise surface later at the
                # caller's sync, outside this try (observed at n=120k).
                jax.block_until_ready(res[0])
                np.asarray(jax.device_get(res[0][:1]))
        except jax.errors.JaxRuntimeError as e:
            print(f"transductive bsr mode failed ({str(e).splitlines()[0][:120]}); "
                  "falling back to sorted")
            if os.environ.get("GLL_EVAL_DEBUG"):
                import traceback
                traceback.print_exc()
            # _transductive_bsr commits smax/ovf_cap/perm to the cache
            # before this guard fires; dropping them here stops the failing
            # 'sticky' budgets from being retried (and re-failing, paying a
            # compile + fallback) on every subsequent eval
            if cache is not None:
                cache.perm = None
                cache.smax = None
                cache.ovf_cap = None
            res = None
        if res is not None:
            return _done(res)
        mode = "sorted"                            # graph too dense to tile
    if mode == "sorted":
        return _done(_solve_sorted(g, y, float(tau), x0))
    if mode == "scatter":
        return _finish(_solve_scatter(g, y, float(tau)),
                       return_info=return_info)
    # ELL width = bucketed max in-degree, bounded by ell_cap_limit; incoming
    # edges of hub rows beyond the bound go to the COO overflow list (its
    # static size is bucketed too, bounding retraces).
    cap = min(ell_cap(int(max_in_degree(g))), ell_cap_limit)
    ovf = int(overflow_count(g, cap))
    ovf_cap = 0 if ovf == 0 else -(-ovf // 4096) * 4096
    return _finish(_solve_ell(g, y, cap, ovf_cap, float(tau)),
                   return_info=return_info)
