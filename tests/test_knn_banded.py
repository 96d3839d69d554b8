"""banded_knn must be EXACTLY knn_tiled under any permutation.

The banded pass is an efficiency device (cross-eval permutation reuse,
VERDICT r4 item 6); its per-row ball-bound certificate guarantees
exactness regardless of permutation quality — a stale or garbage
permutation may only raise the fallback fraction, never change the
answer.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from graphlearninglayer_tpu.ops.knn import knn_tiled
from graphlearninglayer_tpu.ops.knn_banded import banded_knn


def clustered(n, d=32, l=6, seed=0, spread=1.0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(l, d)).astype(np.float32) * 4.0
    lab = rng.integers(0, l, n)
    x = centers[lab] + spread * rng.normal(size=(n, d)).astype(np.float32)
    return x.astype(np.float32), lab


def good_perm(x, n_clusters=32):
    """The production permutation: k-means + similarity-chain ordering
    (exactly what EvalGraphCache.perm holds between evals)."""
    import jax

    from graphlearninglayer_tpu.ops.bsr import chain_rank, kmeans

    labels, cent = kmeans(jnp.asarray(x), n_clusters)
    key = np.asarray(jax.device_get(chain_rank(cent)))[
        np.asarray(jax.device_get(labels))]
    return np.argsort(key, kind="stable")


def assert_same_knn(nbr_a, d2_a, nbr_b, d2_b):
    """Set-equality of neighbor lists per row + matching distances (ties
    may order differently between selection algorithms)."""
    nbr_a, nbr_b = np.asarray(nbr_a), np.asarray(nbr_b)
    d2_a, d2_b = np.asarray(d2_a), np.asarray(d2_b)
    np.testing.assert_allclose(np.sort(d2_a, 1), np.sort(d2_b, 1),
                               rtol=1e-4, atol=1e-5)
    same = (np.sort(nbr_a, 1) == np.sort(nbr_b, 1)).all(1)
    # rows whose sets differ must be tie rows (equal boundary distances)
    for i in np.flatnonzero(~same):
        only_a = set(nbr_a[i]) - set(nbr_b[i])
        assert np.allclose(d2_a[i, -1], d2_b[i, -1], rtol=1e-4), \
            (i, only_a, d2_a[i], d2_b[i])


@pytest.mark.parametrize("n,k", [(1500, 10), (4096, 25)])
def test_banded_matches_tiled_good_perm(n, k):
    x, _ = clustered(n)
    perm = good_perm(x)
    nbr_t, d2_t = knn_tiled(jnp.asarray(x), k)
    nbr_b, d2_b, frac = banded_knn(x, k, perm, block=256, band=8)
    assert nbr_b is not None, f"fallback_frac={frac}"
    assert_same_knn(nbr_b, d2_b, nbr_t, d2_t)
    assert frac < 0.35, frac


def test_banded_exact_under_garbage_perm():
    """A random permutation destroys the band's usefulness; the result is
    either a full-fallback exact answer or a clean (None, ..., frac)
    signal — never a wrong list."""
    x, _ = clustered(2048)
    rng = np.random.default_rng(3)
    perm = rng.permutation(2048)
    k = 15
    nbr_b, d2_b, frac = banded_knn(x, k, perm, block=256, band=4,
                                   max_fallback_frac=1.0)
    nbr_t, d2_t = knn_tiled(jnp.asarray(x), k)
    assert_same_knn(nbr_b, d2_b, nbr_t, d2_t)


def test_banded_signals_hopeless_perm():
    x, _ = clustered(2048, spread=4.0)      # heavy class overlap
    rng = np.random.default_rng(4)
    nbr_b, d2_b, frac = banded_knn(x, 15, rng.permutation(2048),
                                   block=256, band=2,
                                   max_fallback_frac=0.05)
    if nbr_b is None:
        assert frac > 0.05
    else:                                    # got lucky: must be exact
        nbr_t, d2_t = knn_tiled(jnp.asarray(x), 15)
        assert_same_knn(nbr_b, d2_b, nbr_t, d2_t)


def test_banded_nonmultiple_block_and_self_first():
    x, _ = clustered(1000, d=16)
    perm = good_perm(x)
    nbr_b, d2_b, frac = banded_knn(x, 8, perm, block=128, band=6)
    assert nbr_b is not None
    nbr_b, d2_b = np.asarray(nbr_b), np.asarray(d2_b)
    assert nbr_b.shape == (1000, 8)
    np.testing.assert_array_equal(nbr_b[:, 0], np.arange(1000))
    np.testing.assert_array_equal(d2_b[:, 0], 0.0)
    assert (np.diff(d2_b, axis=1) >= -1e-6).all()
    nbr_t, d2_t = knn_tiled(jnp.asarray(x), 8)
    assert_same_knn(nbr_b, d2_b, nbr_t, d2_t)


def test_banded_drift_sequence_reuses_perm():
    """The intended use: one permutation from eval N steers evals N+1.. on
    drifting features, staying exact with a small fallback fraction."""
    x, _ = clustered(4096, d=32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    perm = good_perm(x)
    rng = np.random.default_rng(7)
    for step in range(3):
        x = x + 0.02 * rng.normal(size=x.shape).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        nbr_b, d2_b, frac = banded_knn(x, 25, perm, block=256, band=8)
        assert nbr_b is not None, f"step {step}: frac={frac}"
        nbr_t, d2_t = knn_tiled(jnp.asarray(x), 25)
        assert_same_knn(nbr_b, d2_b, nbr_t, d2_t)


def test_transductive_banded_cache_path(monkeypatch):
    """Second cached eval routes through the banded build and must match
    the uncached (full-build) solve bitwise-tight."""
    import jax

    from graphlearninglayer_tpu.ops.transductive import (
        EvalGraphCache, transductive_laplace)

    monkeypatch.setenv("GLL_BANDED_KNN", "1")      # opt-in path
    monkeypatch.setenv("GLL_BANDED_MIN_N", "1000")
    x, lab = clustered(6000, d=32, l=10, seed=1)
    x = (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)
    y = np.zeros((100, 10), np.float32)
    y[np.arange(100), lab[:100]] = 1.0
    rng = np.random.default_rng(5)

    cache = EvalGraphCache()
    for step in range(3):
        xj, yj = jnp.asarray(x), jnp.asarray(y)
        p_cached = np.asarray(transductive_laplace(
            xj, yj, knn_num=25, cache=cache))
        p_plain = np.asarray(transductive_laplace(xj, yj, knn_num=25))
        # warm-started and cold CG both run to tol; residual-level noise
        # remains (the 1e-4 bound every solver cross-check here uses)
        np.testing.assert_allclose(p_cached, p_plain, rtol=1e-4, atol=1e-5)
        x = x + 0.02 * rng.normal(size=x.shape).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
    assert cache.perm is not None   # BSR path kept the perm cached
