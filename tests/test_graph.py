import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from graphlearninglayer_tpu.ops import (build_graph, dense_weight_matrix,
                                        edge_weights, sym_rowsum, sym_spmm)
from graphlearninglayer_tpu.ops.graph import (build_sym_ell, ell_cap,
                                              ell_reweight, ell_rowsum,
                                              ell_spmm, max_in_degree,
                                              overflow_count)
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


def test_sym_ell_matches_scatter_spmm(rng):
    x, g, W, V, _ = _graphs(rng)
    w, v = edge_weights(g)
    cap = ell_cap(int(max_in_degree(g)))
    assert cap >= int(max_in_degree(g))
    ell = build_sym_ell(g, w, cap)

    np.testing.assert_allclose(np.asarray(ell_rowsum(ell)),
                               np.asarray(sym_rowsum(g, w)), atol=1e-12)
    vec = jnp.asarray(rng.normal(size=(g.n, 5)))
    np.testing.assert_allclose(np.asarray(ell_spmm(ell, vec)),
                               np.asarray(sym_spmm(g, w, vec)), atol=1e-10)

    # reweight reuses the structure for a different symmetric edge value
    ell_v = ell_reweight(g, ell, v)
    np.testing.assert_allclose(np.asarray(ell_spmm(ell_v, vec)),
                               np.asarray(sym_spmm(g, v, vec)), atol=1e-8)
    # reweighting with the original values is a no-op
    np.testing.assert_allclose(np.asarray(ell_reweight(g, ell, w).val),
                               np.asarray(ell.val), atol=0)


def test_sym_ell_overflow_hybrid(rng):
    # cap below the max in-degree forces hub edges into the COO overflow
    x, g, W, V, _ = _graphs(rng)
    w, v = edge_weights(g)
    max_deg = int(max_in_degree(g))
    cap = max(1, max_deg // 2)
    ovf = int(overflow_count(g, cap))
    assert ovf > 0
    ell = build_sym_ell(g, w, cap, ovf + 3)  # slack beyond exact count

    np.testing.assert_allclose(np.asarray(ell_rowsum(ell)),
                               np.asarray(sym_rowsum(g, w)), atol=1e-12)
    vec = jnp.asarray(rng.normal(size=(g.n, 5)))
    np.testing.assert_allclose(np.asarray(ell_spmm(ell, vec)),
                               np.asarray(sym_spmm(g, w, vec)), atol=1e-10)
    ell_v = ell_reweight(g, ell, v)
    np.testing.assert_allclose(np.asarray(ell_spmm(ell_v, vec)),
                               np.asarray(sym_spmm(g, v, vec)), atol=1e-8)


def test_sym_ell_exact_cap_and_duplicates(rng):
    # duplicate points force zero-distance (masked) edges; exact cap (no
    # rounding slack) exercises the rank<cap boundary
    x = rng.normal(size=(40, 4))
    x[7] = x[3]  # coincident pair
    g = build_graph(jnp.asarray(x), 6, "auto")
    w, _ = edge_weights(g)
    cap = int(max_in_degree(g))
    ell = build_sym_ell(g, w, cap)
    vec = jnp.asarray(rng.normal(size=(g.n, 3)))
    np.testing.assert_allclose(np.asarray(ell_spmm(ell, vec)),
                               np.asarray(sym_spmm(g, w, vec)), atol=1e-10)


def test_graph_is_symmetric_and_masked(rng):
    x, g, W, V, _ = _graphs(rng)
    w, _ = edge_weights(g)
    wd = np.asarray(dense_weight_matrix(g, w))
    np.testing.assert_allclose(wd, wd.T, atol=0)
    assert np.all(np.diag(wd) == 0)
