"""Dense (all-matmul) mode vs. edge-list mode equivalence.

The dense formulation (ops/dense_mode.py) must be numerically identical to
the edge-list formulation for forward and backward, in both epsilon modes.
(The oracle parity suite already exercises dense mode via mode='auto'.)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphlearninglayer_tpu.ops import laplace_learning
from tests.oracle import reference_op as ref


@pytest.mark.parametrize("case", [
    dict(tau=0.07, epsilon="auto"),
    dict(tau=0.0, epsilon="auto"),
    dict(tau=0.05, epsilon=1.0),
])
def test_dense_matches_edge(rng, case):
    n, d, k_lab, l, k = 130, 11, 25, 4, 8
    x = jnp.asarray(rng.normal(size=(n, d)))
    y = jnp.asarray(ref.one_hot(rng.integers(0, l, k_lab), l))
    gbar = jnp.asarray(rng.normal(size=(n - k_lab, l)))

    def loss(xv, mode):
        return jnp.sum(laplace_learning(xv, y, k=k, mode=mode, **case)
                       * gbar)

    pd = laplace_learning(x, y, k=k, mode="dense", **case)
    pe = laplace_learning(x, y, k=k, mode="edge", **case)
    np.testing.assert_allclose(np.asarray(pd), np.asarray(pe), atol=1e-9)

    gd = jax.grad(lambda v: loss(v, "dense"))(x)
    ge = jax.grad(lambda v: loss(v, "edge"))(x)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(ge), atol=1e-8)


def test_auto_mode_selects_dense_small():
    # smoke: mode='auto' on a small graph runs (dense path) and matches edge
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(60, 6)))
    y = jnp.asarray(ref.one_hot(rng.integers(0, 3, 12), 3))
    pa = laplace_learning(x, y, tau=0.07, k=5)
    pe = laplace_learning(x, y, tau=0.07, k=5, mode="edge")
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pe), atol=1e-9)


def test_dense_requires_cholesky():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(30, 4)))
    y = jnp.asarray(ref.one_hot(rng.integers(0, 2, 6), 2))
    with pytest.raises(ValueError):
        laplace_learning(x, y, k=4, mode="dense", solver="cg")
