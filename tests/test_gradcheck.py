"""Finite-difference validation of the implicit-differentiation VJP.

The backward pass is a hand-derived adjoint (second solve + edge products +
auto-eps correction), so we check it against central finite differences of
the forward on small graphs.  In auto-eps mode the k-th-neighbor *selection*
is treated as locally constant (a subgradient, as in the reference) — valid
for generic data where small perturbations don't change the KNN sets.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphlearninglayer_tpu.ops import laplace_learning
from tests.oracle import reference_op as ref


def _fd_grad(f, x, h=1e-6):
    g = np.zeros_like(x)
    for i in range(x.shape[0]):
        for j in range(x.shape[1]):
            xp = x.copy(); xp[i, j] += h
            xm = x.copy(); xm[i, j] -= h
            g[i, j] = (f(xp) - f(xm)) / (2 * h)
    return g


@pytest.mark.parametrize("epsilon", ["auto", 1.2])
def test_vjp_matches_finite_differences(rng, epsilon):
    n, d, k_lab, l, k = 40, 5, 10, 3, 6
    x = rng.normal(size=(n, d))
    y = ref.one_hot(rng.integers(0, l, size=k_lab), l)
    gbar = rng.normal(size=(n - k_lab, l))

    def f_np(xv):
        pred = np.asarray(laplace_learning(jnp.asarray(xv), jnp.asarray(y),
                                           tau=0.1, epsilon=epsilon, k=k))
        return float(np.sum(pred * gbar))

    def f_jax(xv):
        return jnp.sum(laplace_learning(xv, jnp.asarray(y), tau=0.1,
                                        epsilon=epsilon, k=k)
                       * jnp.asarray(gbar))

    got = np.asarray(jax.grad(f_jax)(jnp.asarray(x)))
    want = _fd_grad(f_np, x)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_grad_through_stacked_inputs(rng):
    """Input-gradients through base+batch stacking, as the attacks use
    (reference adversarial.py:524-562): grads flow to every row of X."""
    n, d, k_lab, l, k = 36, 4, 9, 3, 5
    x = rng.normal(size=(n, d))
    y = ref.one_hot(rng.integers(0, l, size=k_lab), l)
    labels = rng.integers(0, l, size=n - k_lab)

    def loss(xv):
        pred = laplace_learning(xv, jnp.asarray(y), tau=0.07, k=k)
        onehot = jax.nn.one_hot(jnp.asarray(labels), l, dtype=pred.dtype)
        return -jnp.sum(onehot * jnp.log(pred + 1e-8)) / pred.shape[0]

    g = np.asarray(jax.grad(loss)(jnp.asarray(x)))
    assert g.shape == x.shape
    assert np.all(np.isfinite(g))
    assert np.linalg.norm(g[: k_lab]) > 0  # labeled rows receive gradient too


@pytest.mark.parametrize("mode", ["dense", "edge"])
@pytest.mark.parametrize("epsilon", ["auto", 1.2])
def test_vjp_matches_autodiff_through_solver(rng, mode, epsilon):
    """Machine-precision check of the hand-derived backward: differentiate
    straight THROUGH the forward computation (no custom_vjp) and compare.

    JAX's built-in VJPs for top_k (gradient flows to the selected entries,
    selection fixed) and gather implement exactly the reference's
    subgradient convention for the KNN structure and the k-th-neighbor
    bandwidth, so reverse-mode through ``_forward`` IS the exact implicit
    gradient the custom backward claims to compute (incl. the auto-eps
    term, GLL.py:124-142).  Requires solver='cholesky' (reverse-mode
    cannot cross the CG while_loop).
    """
    from graphlearninglayer_tpu.ops.laplace import (LaplaceConfig, _forward,
                                                    _laplace_op)

    n, d, k_lab, l, k = 48, 5, 12, 3, 6
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float64)
    labels = rng.integers(0, l, k_lab)
    y = jnp.asarray(np.eye(l)[labels], jnp.float64)
    gbar = jnp.asarray(rng.normal(size=(n - k_lab, l)), jnp.float64)
    cfg = LaplaceConfig(tau=0.05,
                        epsilon=epsilon if isinstance(epsilon, str)
                        else float(epsilon),
                        k=k, solver="cholesky", mode=mode,
                        use_pallas="never" if mode == "dense" else "auto")

    def loss_custom(xv):
        return jnp.vdot(gbar, _laplace_op(cfg, xv, y))

    def loss_autodiff(xv):
        pred, _ = _forward(cfg, xv, y)
        return jnp.vdot(gbar, pred)

    g_custom = jax.grad(loss_custom)(x)
    g_auto = jax.grad(loss_autodiff)(x)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_auto),
                               rtol=1e-9, atol=1e-11)
