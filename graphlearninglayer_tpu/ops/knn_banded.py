"""Cluster-banded exact KNN with per-row certification.

Attacks the KNN-build wall of the big-graph transductive eval (reference
workload: utils.py:637-651 rebuilds its graph from scratch every eval
epoch).  At n=60k/k=50 the full build costs ~1.0-1.4 s of a ~3 s warm
eval, and ~all of it is ``lax.top_k`` selection over 60k-wide rows (the
distance panel itself is ~36 ms; selection cost scales linearly with both
row width and k — benchmarks/probe_knn_topk.py, CLOSED analysis in
benchmarks/RESULTS.md).

Between eval epochs of one training run the features drift slowly, and
the eval cache already holds last eval's k-means + similarity-chain
permutation (ops/transductive.EvalGraphCache.perm).  Under that
permutation, feature-space-coherent rows are CONTIGUOUS — so each row's
true nearest neighbors live overwhelmingly in a few column blocks, and
selection can run over a narrow banded panel instead of the full width:

  1. partition the permuted rows into ``nb`` contiguous blocks of
     ``block`` rows; compute each block's centroid and radius on the
     CURRENT features (one pass — correctness never depends on drift);
  2. per row block, scan the ``band`` column blocks with the smallest
     per-block lower bound (always including its own): distances + top-k
     over ``band*block`` columns instead of n;
  3. certify each row i exactly with the ball bound
        d2(i, j in block b) >= max(0, ||x_i - c_b|| - r_b)^2 = LB2(i, b):
     if min over UNSCANNED blocks of LB2(i, b) > (row i's k-th banded
     distance), no unscanned point can enter its top-k — the banded
     result IS the exact KNN for that row;
  4. uncertified rows (stale permutation, boundary rows) rerun against
     the full panel in one bucketed batch.

Every returned list is therefore exactly ``knn_tiled``'s (up to ties).
The permutation only steers efficiency: a garbage permutation means a
100% fallback, never a wrong answer.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["banded_knn"]


def _pad_perm(perm: np.ndarray, n: int, n_pad: int) -> np.ndarray:
    """Extend a permutation of 0..n-1 with pad ids n..n_pad-1 at the end."""
    if len(perm) == n_pad:
        return perm
    return np.concatenate([np.asarray(perm, np.int64),
                           np.arange(n, n_pad, dtype=np.int64)])


@functools.partial(jax.jit, static_argnums=(1, 3, 4))
def _banded_scan(x_p, k: int, self_id, block: int, band: int):
    """The banded pass over permuted rows.

    Returns (nbr_p, dist2, certified): neighbor ids in PERMUTED space,
    ascending squared distances (self pinned first), and the per-row
    exactness certificate.
    """
    n, d = x_p.shape
    nb = n // block
    xb = x_p.reshape(nb, block, d)
    centers = jnp.mean(xb, axis=1)                          # (nb, d)
    rad = jnp.sqrt(jnp.max(
        jnp.sum((xb - centers[:, None, :]) ** 2, axis=-1), axis=1))

    # per-row distance to every block center -> ball lower bounds
    xx = jnp.sum(x_p * x_p, axis=-1)
    cc = jnp.sum(centers * centers, axis=-1)
    cross = jax.lax.dot_general(x_p, centers, (((1,), (1,)), ((), ())),
                                preferred_element_type=x_p.dtype)
    dc = jnp.sqrt(jnp.maximum(xx[:, None] + cc[None, :] - 2.0 * cross, 0.0))
    lb2 = jnp.maximum(dc - rad[None, :], 0.0) ** 2          # (n, nb)

    # band per ROW BLOCK: the `band` column blocks with the smallest
    # within-block-minimum lower bound; own block forced first
    s = jnp.min(lb2.reshape(nb, block, nb), axis=1)         # (nb, nb)
    s = jnp.where(jnp.eye(nb, dtype=bool), -1.0, s)
    _, band_ids = jax.lax.top_k(-s, band)                   # (nb, band)
    band_ids = band_ids.astype(jnp.int32)

    col_base = jnp.arange(block, dtype=jnp.int32)

    def one_block(args):
        q, bids, lb2_q = args     # (), (band,), (block, nb)
        rows = q * block + col_base                          # permuted ids
        cols = (bids[:, None] * block + col_base[None, :]).reshape(-1)
        xc = x_p[cols]                                       # (band*block, d)
        qq = xx[rows]
        ccx = xx[cols]
        cr = jax.lax.dot_general(xb[q], xc, (((1,), (1,)), ((), ())),
                                 preferred_element_type=x_p.dtype)
        d2 = jnp.maximum(qq[:, None] + ccx[None, :] - 2.0 * cr, 0.0)
        is_self = self_id[rows][:, None] == self_id[cols][None, :]
        d2 = jnp.where(is_self, -1.0, d2)
        neg_top, idx = jax.lax.top_k(-d2, k)
        dist2 = -neg_top                                     # ascending
        nbr = cols[idx]                                      # permuted ids
        # certificate: min lower bound over blocks OUTSIDE the band
        scanned = jnp.any(
            jnp.arange(nb, dtype=jnp.int32)[None, :] == bids[:, None], 0)
        m = jnp.min(jnp.where(scanned[None, :], jnp.inf, lb2_q), axis=1)
        # slack absorbs the panel's reduced-precision rounding (the
        # default-precision MXU panel computes f32 operands at bf16-ish
        # accuracy — CLAUDE.md): the bound must stay SOUND against the
        # same panel the selection saw
        t = dist2[:, k - 1]
        cert = m > t + 1e-3 * (1.0 + t)
        return nbr, jnp.maximum(dist2, 0.0), cert

    nbr, dist2, cert = jax.lax.map(
        one_block, (jnp.arange(nb, dtype=jnp.int32), band_ids,
                    lb2.reshape(nb, block, nb)))
    return (nbr.reshape(-1, k), dist2.reshape(-1, k), cert.reshape(-1))


@functools.partial(jax.jit, static_argnums=(2, 3))
def _fallback_rows(x_p, rows, k: int, self_chunk: int = 4096):
    """Exact full-width KNN for a bucketed batch of (permuted) row ids."""
    n, d = x_p.shape
    xq = x_p[rows]
    xx = jnp.sum(x_p * x_p, axis=-1)
    qq = jnp.sum(xq * xq, axis=-1)
    cross = jax.lax.dot_general(xq, x_p, (((1,), (1,)), ((), ())),
                                preferred_element_type=x_p.dtype)
    d2 = jnp.maximum(qq[:, None] + xx[None, :] - 2.0 * cross, 0.0)
    is_self = rows[:, None] == jnp.arange(n, dtype=jnp.int32)[None, :]
    d2 = jnp.where(is_self, -1.0, d2)
    neg_top, idx = jax.lax.top_k(-d2, k)
    return idx.astype(jnp.int32), jnp.maximum(-neg_top, 0.0)


def _bucket(v: int, lo: int = 1024) -> int:
    b = lo
    while b < v:
        b *= 2
    return b


def banded_knn(x, k: int, perm, block: int = 512, band: int = 16,
               max_fallback_frac: float = 0.35):
    """Exact KNN of ``x`` (n, d) steered by a (possibly stale) permutation.

    Drop-in for :func:`ops.knn.knn_tiled` — identical (nbr, dist2) output
    in ORIGINAL row order (self first, ascending squared distances; ties
    may order differently).  ``perm`` is a host int array permuting rows
    into feature-space-coherent contiguous order, e.g. last eval's cached
    BSR k-means+chain permutation.

    Returns (nbr, dist2, fallback_frac); ``fallback_frac`` is the
    fraction of rows the certificate sent to the full panel (observability
    + staleness signal for the caller's cache policy).  If it exceeds
    ``max_fallback_frac`` the banded pass has lost — ``(None, None,
    frac)`` is returned and the caller should run ``knn_tiled`` and
    refresh its permutation (running the bucketed fallback on most of the
    rows would cost MORE than one clean full build).
    """
    n, d = x.shape
    nbk = max(1, min(band, (n + block - 1) // block))
    pad = (-n) % block
    perm = np.asarray(perm, np.int64)
    assert len(perm) == n, (len(perm), n)
    perm_p = _pad_perm(perm, n, n + pad)
    xj = jnp.asarray(x)
    if pad:
        far = jnp.max(jnp.abs(xj)) * 1e3 + 1e3
        fill = far * (1.0 + jnp.arange(pad, dtype=xj.dtype)[:, None])
        xj = jnp.concatenate(
            [xj, jnp.broadcast_to(fill, (pad, d))], axis=0)
    x_p = xj[jnp.asarray(perm_p)]
    # original ids per permuted position — the self/identity channel
    self_id = jnp.asarray(perm_p, jnp.int32)

    nbr_p, dist2, cert = _banded_scan(x_p, k, self_id, block, nbk)
    cert_np = np.array(cert[: len(perm_p)])
    cert_np[n:] = True                       # pad rows: don't care
    bad = np.flatnonzero(~cert_np)
    frac = len(bad) / n
    if frac > max_fallback_frac:
        return None, None, frac
    if len(bad):
        cap = _bucket(len(bad))
        rows = np.full(cap, int(len(perm_p) - 1), np.int64)  # pad w/ last
        rows[: len(bad)] = bad
        fb_nbr, fb_d2 = _fallback_rows(x_p, jnp.asarray(rows, jnp.int32), k)
        nbr_p = nbr_p.at[jnp.asarray(rows)].set(fb_nbr)
        dist2 = dist2.at[jnp.asarray(rows)].set(fb_d2)

    # back to original space: rows reordered by inv(perm), neighbor ids
    # mapped through perm
    inv = np.empty(len(perm_p), np.int64)
    inv[perm_p] = np.arange(len(perm_p))
    nbr = jnp.asarray(perm_p, jnp.int32)[nbr_p][jnp.asarray(inv[:n])]
    dist2 = dist2[jnp.asarray(inv[:n])]
    return nbr, dist2, frac
