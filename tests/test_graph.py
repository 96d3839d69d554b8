import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from graphlearninglayer_tpu.ops import (build_graph, dense_weight_matrix,
                                        edge_weights, sym_rowsum, sym_spmm)
from tests.oracle.reference_op import build_affinity


def _graphs(rng, n=120, d=10, k=8, epsilon="auto"):
    x = rng.normal(size=(n, d))
    g = build_graph(jnp.asarray(x), k, epsilon)
    W, V, mod_V, C, knn_ind, eps = build_affinity(x, k, epsilon)
    return x, g, W, V, eps


def test_weight_matrix_matches_oracle_auto(rng):
    x, g, W, V, eps = _graphs(rng)
    w, v = edge_weights(g)
    got_w = np.asarray(dense_weight_matrix(g, w))
    got_v = np.asarray(dense_weight_matrix(g, v))
    np.testing.assert_allclose(got_w, W.toarray(), atol=1e-10)
    np.testing.assert_allclose(got_v, V.toarray(), atol=1e-8)
    np.testing.assert_allclose(np.asarray(g.eps), eps, atol=1e-10)


def test_weight_matrix_matches_oracle_fixed_eps(rng):
    x, g, W, V, eps = _graphs(rng, epsilon=1.5)
    w, _ = edge_weights(g)
    np.testing.assert_allclose(np.asarray(dense_weight_matrix(g, w)),
                               W.toarray(), atol=1e-10)


def test_rowsum_and_spmm_match_dense(rng):
    x, g, W, V, _ = _graphs(rng)
    w, _ = edge_weights(g)
    deg = np.asarray(sym_rowsum(g, w))
    np.testing.assert_allclose(deg, np.asarray(W.sum(axis=1)).ravel(),
                               atol=1e-10)
    vec = rng.normal(size=(g.n, 5))
    got = np.asarray(sym_spmm(g, w, jnp.asarray(vec)))
    np.testing.assert_allclose(got, W @ vec, atol=1e-10)


def test_graph_is_symmetric_and_masked(rng):
    x, g, W, V, _ = _graphs(rng)
    w, _ = edge_weights(g)
    wd = np.asarray(dense_weight_matrix(g, w))
    np.testing.assert_allclose(wd, wd.T, atol=0)
    assert np.all(np.diag(wd) == 0)
