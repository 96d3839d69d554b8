import jax.numpy as jnp
import numpy as np

from graphlearninglayer_tpu.ops import knn, knn_tiled, pairwise_dist2
from tests.oracle.reference_op import brute_knn


def test_pairwise_dist2(rng):
    x = rng.normal(size=(40, 7))
    y = rng.normal(size=(30, 7))
    got = np.asarray(pairwise_dist2(jnp.asarray(x), jnp.asarray(y)))
    want = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_knn_matches_bruteforce(rng):
    x = rng.normal(size=(100, 16))
    idx, dist2 = knn(jnp.asarray(x), 9)
    ref_idx, ref_dist = brute_knn(x, 9)
    assert np.array_equal(np.asarray(idx)[:, 0], np.arange(100))
    np.testing.assert_allclose(np.sqrt(np.asarray(dist2)), ref_dist, atol=1e-8)
    # indices may differ under exact ties only; random data has none
    assert np.array_equal(np.asarray(idx), ref_idx)


def test_knn_tiled_matches_dense(rng):
    x = jnp.asarray(rng.normal(size=(300, 12)))
    i1, d1 = knn(x, 11)
    i2, d2 = knn_tiled(x, 11, block=128)
    assert np.array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-9)
