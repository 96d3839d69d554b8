"""Pallas TPU kernel: fused all-pairs distance + running exact top-k.

This is the "tiled all-pairs-distance + top-k" kernel promised by the
TPU redesign of the reference's Annoy KNN (SURVEY.md §2.2): the XLA
formulation (ops/knn.py knn_tiled) materializes (block, n) distance panels
in HBM and hands them to ``lax.top_k``, whose sort dominates the whole
transductive build (~0.96s of 1.5s at 60k nodes; the distance matmuls are
~36ms — benchmarks/probe_knn_topk.py).  Here each (TQ, TC) tile is produced
on the MXU and immediately folded into a per-row running top-RT in VMEM, so
no distance panel ever reaches HBM and selection only sorts tiles that
actually contain candidates:

  * the running top-RT is kept SORTED ascending; a tile first checks
    ``any(d2 < worst_kept)`` and skips the sort entirely otherwise (after
    the first few column tiles, most tiles lose this check);
  * candidate tiles are bitonic-sorted descending, their RT smallest are
    concatenated with the ascending running list — a bitonic sequence —
    and one log(2RT) bitonic merge re-sorts it;
  * compare-exchange partners (lane XOR j) are formed with two lane rolls
    (``pltpu.roll``) — Mosaic lowers neither ``sort``/``top_k`` nor the
    reshape/``rev`` formulation (benchmarks/probe_pallas_sort.py), rolls
    are the one shuffle that compiles;
  * indices ride along through every exchange (value-keyed co-sort).

Exactness: identical k minima to ``lax.top_k`` (ties may order
differently; ties do not occur for non-degenerate data, and the self edge
is pinned first via d2 = -1 exactly as in ops/knn.py).

MEASURED RESULT (TPU v5e, 60k nodes, d=128, k=50 — this kernel is kept as
an *experimental* path, NOT wired into knn_tiled): exact parity with
``lax.top_k`` but SLOWER — best 1.37s (tq=512,tc=256) vs 0.96s for the XLA
panel+top_k (benchmarks/probe_fused_knn.py).  Two structural reasons:
(1) the tile-skip check never fires at this n/k — a top-64 record lands in
essentially every 256-column tile when scanning 235 tiles/row (expected
record-bearing tiles ~ k*ln(ntiles) > ntiles), so the full bitonic sort
(36 roll+select passes over every (tq,tc) tile, ~1e12 VPU elem-ops at
n=60k) runs unconditionally; (2) value-keyed index co-sort doubles the
shuffle traffic and cannot be packed into the f32 payload without
perturbing near-tie ordering (breaks exact-k-th-NN parity for auto-eps).
A comparison-network selection of top-64-of-256 costs >=~20 passes, so the
in-kernel approach caps out around ~0.3-0.5s even at perfect VPU
utilization — not worth the complexity over XLA's 0.96s.  Revisit only if
Mosaic gains a native sort/top_k lowering (benchmarks/probe_pallas_sort.py
tracks what compiles).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_knn"]

_BIG = 3.0e38                 # plain float: a jnp scalar would be captured
                              # as a kernel constant, which Pallas rejects


def _cx_pass(v, ix, stage, j, ascending=True):
    """One bitonic compare-exchange pass over the lane dim (value-keyed)."""
    q, m = v.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (q, m), 1)
    first = (lane & j) == 0
    pv = jnp.where(first, pltpu.roll(v, (-j) % m, 1), pltpu.roll(v, j, 1))
    pi = jnp.where(first, pltpu.roll(ix, (-j) % m, 1), pltpu.roll(ix, j, 1))
    up = ((lane & stage) == 0) == ascending
    le = v <= pv
    lo_v, hi_v = jnp.where(le, v, pv), jnp.where(le, pv, v)
    lo_i, hi_i = jnp.where(le, ix, pi), jnp.where(le, pi, ix)
    keep_lo = first == up
    return (jnp.where(keep_lo, lo_v, hi_v),
            jnp.where(keep_lo, lo_i, hi_i))


def _bitonic_sort(v, ix, ascending=True):
    """Full bitonic sort along the lane dim (static power-of-two width)."""
    m = v.shape[1]
    stage = 2
    while stage <= m:
        j = stage // 2
        while j >= 1:
            v, ix = _cx_pass(v, ix, stage, j, ascending)
            j //= 2
        stage *= 2
    return v, ix


def _bitonic_merge(v, ix, ascending=True):
    """Sort a bitonic sequence (asc half + desc half) — log(m) passes."""
    m = v.shape[1]
    j = m // 2
    while j >= 1:
        v, ix = _cx_pass(v, ix, m, j, ascending)
        j //= 2
    return v, ix


def _make_kernel(n: int, tq: int, tc: int, rt: int):
    def kernel(xq_ref, xc_ref, od_ref, oi_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            od_ref[:] = jnp.full((tq, rt), _BIG, jnp.float32)
            oi_ref[:] = jnp.zeros((tq, rt), jnp.int32)

        xq = xq_ref[:]
        xc = xc_ref[:]
        cross = jax.lax.dot_general(
            xq, xc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        qq = jnp.sum(xq * xq, axis=1, keepdims=True)
        cc = jnp.sum(xc * xc, axis=1, keepdims=True).reshape(1, tc)
        d2 = jnp.maximum(qq + cc - 2.0 * cross, 0.0)
        rows = (jax.lax.broadcasted_iota(jnp.int32, (tq, tc), 0) + i * tq)
        cols = (jax.lax.broadcasted_iota(jnp.int32, (tq, tc), 1) + j * tc)
        d2 = jnp.where(rows == cols, -1.0, d2)   # self pinned first
        d2 = jnp.where(cols >= n, _BIG, d2)      # padding columns excluded

        worst = od_ref[:, rt - 1:rt]

        @pl.when(jnp.any(d2 < worst))
        def _():
            # tile's rt smallest, descending (tail of a descending sort)
            tv, ti = _bitonic_sort(d2, cols, ascending=False)
            tv = tv[:, tc - rt:]
            ti = ti[:, tc - rt:]
            # ascending running list + descending candidates = bitonic
            mv = jnp.concatenate([od_ref[:], tv], axis=1)
            mi = jnp.concatenate([oi_ref[:], ti], axis=1)
            mv, mi = _bitonic_merge(mv, mi, ascending=True)
            od_ref[:] = mv[:, :rt]
            oi_ref[:] = mi[:, :rt]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("k", "tq", "tc", "rt", "interpret"))
def fused_knn(x: jax.Array, k: int, tq: int = 256, tc: int = 256,
              rt: int = 64, interpret: bool = False):
    """Exact KNN of the rows of ``x`` — ``(nbr, dist2)``, both (n, k),
    self as neighbor 0 — without materializing any distance panel.

    Requires ``k <= rt`` (rt is the running-top width, a power of two
    <= tc).  Arbitrary n and d (padded internally).
    """
    if k > rt:
        raise ValueError(f"fused_knn requires k <= rt ({k} > {rt})")
    if rt & (rt - 1) or tc & (tc - 1) or tq & (tq - 1):
        raise ValueError("rt, tq and tc must be powers of two")
    n, d = x.shape
    xp = x.astype(jnp.float32)
    dpad = (-d) % 128
    if dpad:
        xp = jnp.pad(xp, ((0, 0), (0, dpad)))
    pad = (-n) % max(tq, tc)         # powers of two: max is a common multiple
    if pad:
        xp = jnp.pad(xp, ((0, pad), (0, 0)))
    npad = n + pad
    grid = (npad // tq, npad // tc)

    out_d, out_i = pl.pallas_call(
        _make_kernel(n, tq, tc, rt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, xp.shape[1]), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, xp.shape[1]), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tq, rt), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, rt), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid[0] * tq, rt), jnp.float32),
            jax.ShapeDtypeStruct((grid[0] * tq, rt), jnp.int32),
        ],
        interpret=interpret,
    )(xp, xp)
    return (out_i[:n, :k], jnp.maximum(out_d[:n, :k], 0.0))
