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
