"""Pallas kernels vs. their jnp oracles (interpreter mode on CPU)."""
import jax.numpy as jnp
import numpy as np

from graphlearninglayer_tpu.ops.dense_mode import (build_dense_graph,
                                                   dense_affinity)
from graphlearninglayer_tpu.ops.kernels.affinity import (fused_affinity,
                                                         fused_affinity_sym)


def test_fused_affinity_matches_dense(rng):
    n, d = 512, 16
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    g = build_dense_graph(x, 9, "auto")
    w_ref, _ = dense_affinity(g)
    w = fused_affinity(x, g.eps.astype(jnp.float32),
                       g.mask.astype(jnp.float32), tm=128, tn=128,
                       interpret=True)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=1e-6)


def test_fused_affinity_fixed_eps(rng):
    n, d = 256, 8
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    g = build_dense_graph(x, 7, 1.5)
    w_ref, _ = dense_affinity(g)
    w = fused_affinity(x, g.eps.astype(jnp.float32),
                       g.mask.astype(jnp.float32), tm=128, tn=128,
                       interpret=True)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=1e-6)


def test_fused_affinity_sym_matches_dense(rng):
    """The in-kernel symmetrization variant (fed the raw directed indicator)
    matches the XLA mask+affinity oracle, including non-divisible n."""
    for n in (384, 300):
        x = jnp.asarray(rng.normal(size=(n, 12)).astype(np.float32))
        g = build_dense_graph(x, 9, "auto")
        w_ref, _ = dense_affinity(g)
        w = fused_affinity_sym(x, g.eps.astype(jnp.float32),
                               g.m_raw.astype(jnp.float32), tm=128, tn=128,
                               interpret=True)
        np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref),
                                   atol=1e-6)
