"""BSR (dense-tile) SpMM: parity with the scatter oracle and mode parity.

The BSR path accumulates exactly the same union-edge values as ``sym_spmm``
(ops/graph.py), only in tile order, so results must agree to summation-
order tolerance; the transductive 'bsr' mode must match 'scatter'/'sorted'.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphlearninglayer_tpu.ops.bsr import (bsr_plan, bsr_spmm, bsr_stats,
                                            build_bsr_mat, kmeans_labels)
from graphlearninglayer_tpu.ops.graph import (build_graph, edge_weights,
                                              sym_spmm)
from graphlearninglayer_tpu.ops.transductive import (one_hot_encode,
                                                     transductive_laplace)


def _clustered(n, d=16, l=5, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(l, d)) * 3.0
    lab = rng.integers(0, l, n)
    x = centers[lab] + rng.normal(size=(n, d))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return jnp.asarray(x), lab


@pytest.mark.parametrize("n,block", [(600, 64), (1000, 128), (777, 64)])
def test_bsr_spmm_matches_scatter_oracle(n, block):
    x, _ = _clustered(n)
    g = build_graph(x, 10)
    k_lab = 40
    plan = bsr_plan(x, g, k_lab, 8, block)
    smax = int(plan.max_blocks)

    # permuted graph's symmetric matrix == permutation of the original's
    wp, _ = edge_weights(plan.gp)
    mat = build_bsr_mat(plan, wp, block, smax, 0)
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.normal(size=(n, 5)))
    got = bsr_spmm(mat, p, n)
    want = sym_spmm(plan.gp, wp, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-10, atol=1e-12)

    # slot padding: extra slots change nothing
    mat2 = build_bsr_mat(plan, wp, block, smax + 3, 0)
    got2 = bsr_spmm(mat2, p, n)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(got),
                               rtol=1e-12, atol=1e-14)

    # hybrid: a tight slot budget pushes edges to the COO overflow path,
    # result identical; slot histogram prices the split exactly
    hist = np.asarray(bsr_stats(plan, block))
    assert hist.sum() == int((np.asarray(g.coef) > 0).sum()) * 2
    tight = max(smax // 2, 1)
    ovf = int(hist[tight:].sum())
    assert ovf > 0
    ovf_cap = -(-ovf // 64) * 64
    mat3 = build_bsr_mat(plan, wp, block, tight, ovf_cap)
    got3 = bsr_spmm(mat3, p, n)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(got),
                               rtol=1e-10, atol=1e-12)


def test_bsr_plan_permutation_properties():
    n, k_lab = 640, 50
    x, _ = _clustered(n)
    g = build_graph(x, 8)
    plan = bsr_plan(x, g, k_lab, 8, 64)
    perm = np.asarray(plan.perm)
    inv = np.asarray(plan.inv)
    assert sorted(perm.tolist()) == list(range(n))
    np.testing.assert_array_equal(inv[perm], np.arange(n))
    # labeled nodes (original ids < k_lab) occupy the first k_lab slots
    assert set(perm[:k_lab].tolist()) == set(range(k_lab))
    # permuted graph is the same graph: degrees match under the permutation
    w, _ = edge_weights(g)
    wp, _ = edge_weights(plan.gp)
    from graphlearninglayer_tpu.ops.graph import sym_rowsum
    np.testing.assert_allclose(np.asarray(sym_rowsum(plan.gp, wp)),
                               np.asarray(sym_rowsum(g, w))[perm],
                               rtol=1e-10, atol=1e-12)


def test_transductive_bsr_matches_scatter():
    n, l, k_lab = 900, 5, 60
    x, lab = _clustered(n, l=l, seed=3)
    y = one_hot_encode(jnp.asarray(lab[:k_lab]), l)
    ref = transductive_laplace(x, y, knn_num=12, mode="scatter")
    got = transductive_laplace(x, y, knn_num=12, mode="bsr", bsr_block=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-8)
    # predictions actually classify the clusters (sanity, not just parity)
    acc = (np.asarray(jnp.argmax(got, 1)) == lab[k_lab:]).mean()
    assert acc > 0.9


def test_transductive_bsr_fallback_small_graph():
    # n < 4*block -> silently uses the sorted path; result must still match
    n, l, k_lab = 300, 4, 40
    x, lab = _clustered(n, l=l, seed=5)
    y = one_hot_encode(jnp.asarray(lab[:k_lab]), l)
    ref = transductive_laplace(x, y, knn_num=10, mode="sorted")
    got = transductive_laplace(x, y, knn_num=10, mode="bsr", bsr_block=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-8, atol=1e-10)


def test_transductive_bsr_fallback_tile_budget():
    n, l, k_lab = 600, 4, 40
    x, lab = _clustered(n, l=l, seed=6)
    y = one_hot_encode(jnp.asarray(lab[:k_lab]), l)
    ref = transductive_laplace(x, y, knn_num=10, mode="sorted")
    got = transductive_laplace(x, y, knn_num=10, mode="bsr", bsr_block=64,
                               bsr_max_tile_bytes=1)   # force fallback
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-8, atol=1e-10)


def test_kmeans_labels_recovers_separated_clusters():
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(4, 8)) * 20.0
    lab = rng.integers(0, 4, 512)
    x = jnp.asarray(centers[lab] + 0.01 * rng.normal(size=(512, 8)))
    got = np.asarray(kmeans_labels(x, 4, n_iter=10))
    # cluster ids are a relabeling of ground truth
    for c in range(4):
        assert len(set(got[lab == c])) == 1
    assert len(set(got)) == 4


# ---------------------------------------------------------------------------
# EvalGraphCache: cross-eval amortization must never change results


def test_transductive_cache_matches_fresh_and_reuses_plan(monkeypatch):
    """Second eval with a shared EvalGraphCache: (a) result identical to a
    cache-free solve, (b) the k-means pass is skipped (bsr_plan_from_perm
    used), (c) static budgets are sticky, (d) the CG warm start cuts the
    iteration count on slowly-drifting features."""
    import graphlearninglayer_tpu.ops.transductive as tr
    from graphlearninglayer_tpu.ops import EvalGraphCache

    n, l, k_lab = 900, 5, 60
    x1, lab = _clustered(n, l=l, seed=11)
    rng = np.random.default_rng(12)
    # small feature drift, cluster structure intact (eval-epoch analogue)
    x2 = jnp.asarray(np.asarray(x1) + 0.02 * rng.normal(size=x1.shape))
    y = one_hot_encode(jnp.asarray(lab[:k_lab]), l)

    fresh_calls = []
    orig_plan = tr.bsr_plan
    monkeypatch.setattr(tr, "bsr_plan",
                        lambda *a, **k: fresh_calls.append(1)
                        or orig_plan(*a, **k))

    cache = EvalGraphCache()
    kw = dict(knn_num=12, mode="bsr", bsr_block=64, return_info=True)
    p1, it1, _ = transductive_laplace(x1, y, cache=cache, **kw)
    assert fresh_calls == [1]
    smax1, ovf1 = cache.smax, cache.ovf_cap

    p2c, it2c, _ = transductive_laplace(x2, y, cache=cache, **kw)
    assert fresh_calls == [1]          # k-means pass skipped on eval 2
    assert (cache.smax, cache.ovf_cap) == (smax1, ovf1)  # sticky shapes
    p2f, it2f, _ = transductive_laplace(x2, y, **kw)     # cache-free oracle
    np.testing.assert_allclose(np.asarray(p2c), np.asarray(p2f),
                               rtol=1e-6, atol=1e-8)
    assert it2c < it2f                 # warm start converges faster


def test_transductive_cache_stale_perm_falls_back_to_fresh(monkeypatch):
    """Features that moved completely (different clustering) must trigger a
    fresh plan, and the result must still match the cache-free solve."""
    import graphlearninglayer_tpu.ops.transductive as tr
    from graphlearninglayer_tpu.ops import EvalGraphCache

    n, l, k_lab = 900, 5, 60
    x1, lab1 = _clustered(n, l=l, seed=21)
    x2, lab2 = _clustered(n, l=l, seed=99)   # unrelated clustering
    y1 = one_hot_encode(jnp.asarray(lab1[:k_lab]), l)
    y2 = one_hot_encode(jnp.asarray(lab2[:k_lab]), l)

    fresh_calls = []
    orig_plan = tr.bsr_plan
    monkeypatch.setattr(tr, "bsr_plan",
                        lambda *a, **k: fresh_calls.append(1)
                        or orig_plan(*a, **k))

    cache = EvalGraphCache()
    kw = dict(knn_num=12, mode="bsr", bsr_block=64)
    transductive_laplace(x1, y1, cache=cache, **kw)
    got = transductive_laplace(x2, y2, cache=cache, **kw)
    ref = transductive_laplace(x2, y2, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-8)
    # either the stale perm still tiled acceptably (1 fresh call) or the
    # staleness check forced a recompute (2); never zero on call 1
    assert len(fresh_calls) in (1, 2)


def test_transductive_cache_sorted_mode_warm_start():
    from graphlearninglayer_tpu.ops import EvalGraphCache

    n, l, k_lab = 500, 4, 40
    x, lab = _clustered(n, l=l, seed=31)
    y = one_hot_encode(jnp.asarray(lab[:k_lab]), l)
    cache = EvalGraphCache()
    kw = dict(knn_num=10, mode="sorted", return_info=True)
    p1, it1, _ = transductive_laplace(x, y, cache=cache, **kw)
    # identical features: warm start should converge almost immediately
    p2, it2, _ = transductive_laplace(x, y, cache=cache, **kw)
    assert it2 <= max(it1 // 4, 2)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                               rtol=1e-6, atol=1e-8)


def test_transductive_cache_shape_change_is_safe():
    from graphlearninglayer_tpu.ops import EvalGraphCache

    l = 4
    cache = EvalGraphCache()
    for n, seed in ((500, 41), (620, 42)):     # n changes between calls
        k_lab = 40
        x, lab = _clustered(n, l=l, seed=seed)
        y = one_hot_encode(jnp.asarray(lab[:k_lab]), l)
        got = transductive_laplace(x, y, knn_num=10, mode="bsr",
                                   bsr_block=64, cache=cache)
        ref = transductive_laplace(x, y, knn_num=10, mode="bsr",
                                   bsr_block=64)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-8)


def test_transductive_cache_stale_perm_replans_under_budget(monkeypatch):
    """A cached permutation from an UNRELATED clustering must trigger the
    staleness replan when the budget-capped slot count cannot cover the
    mis-tiled graph (the round-4 fix: staleness is judged at the capped
    smax the solve would use, not at the uncapped 99%-coverage point)."""
    import graphlearninglayer_tpu.ops.transductive as tr
    from graphlearninglayer_tpu.ops import EvalGraphCache

    n, l, k_lab = 1200, 5, 60
    x1, lab1 = _clustered(n, l=l, seed=51)
    x2, lab2 = _clustered(n, l=l, seed=77)    # unrelated clustering
    y1 = one_hot_encode(jnp.asarray(lab1[:k_lab]), l)
    y2 = one_hot_encode(jnp.asarray(lab2[:k_lab]), l)

    fresh_calls = []
    orig_plan = tr.bsr_plan
    monkeypatch.setattr(tr, "bsr_plan",
                        lambda *a, **k: fresh_calls.append(1)
                        or orig_plan(*a, **k))
    cache = EvalGraphCache()
    # budget of exactly 8 tile slots (f64 under the test conftest): plenty
    # for a fresh cluster-ordered plan, far too small for the graph tiled
    # under a foreign permutation
    kw = dict(knn_num=10, mode="bsr", bsr_block=64,
              bsr_max_tile_bytes=5_200_000)
    transductive_laplace(x1, y1, cache=cache, **kw)
    assert fresh_calls == [1]
    got = transductive_laplace(x2, y2, cache=cache, **kw)
    assert fresh_calls == [1, 1], "stale perm must force a fresh plan"
    ref = transductive_laplace(x2, y2, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-8)
