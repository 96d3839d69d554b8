"""Forward/backward parity of the TPU op vs. the scipy reference oracle.

The oracle (tests/oracle/reference_op.py) reproduces the documented semantics
of the reference ``LaplaceLearningSparseHard`` (GLL.py:10-177) in float64
scipy; these tests check allclose agreement of predictions and input
gradients across the op's tau/epsilon/solver configurations.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphlearninglayer_tpu.ops import laplace_learning
from tests.oracle import reference_op as ref


def _problem(rng, n=140, d=12, k_lab=30, l=5, k=9):
    x = rng.normal(size=(n, d))
    labels = rng.integers(0, l, size=k_lab)
    y = ref.one_hot(labels, l)
    return x, y, labels


CASES = [
    dict(tau=0.07, epsilon="auto"),   # FullySup convention (temp-as-tau)
    dict(tau=0.0, epsilon="auto"),    # adversarial-driver convention
    dict(tau=1e-8, epsilon="auto"),   # numpy eval convention
    dict(tau=0.05, epsilon=1.0),      # fixed-bandwidth mode
]


@pytest.mark.parametrize("case", CASES)
def test_forward_parity(rng, case):
    x, y, _ = _problem(rng)
    want, _ = ref.forward(x, y, k=9, **case)
    got = np.asarray(laplace_learning(jnp.asarray(x), jnp.asarray(y), k=9,
                                      **case))
    np.testing.assert_allclose(got, want, atol=1e-8, rtol=1e-7)
    # rows sum to 1 exactly only in the unregularized system (tau adds a
    # diagonal leak: row sums become 1 - tau*(Luu+tau I)^-1 @ 1)
    if case["tau"] <= 1e-6:
        np.testing.assert_allclose(got.sum(axis=1), 1.0, atol=1e-5)


@pytest.mark.parametrize("case", CASES)
def test_backward_parity(rng, case):
    x, y, _ = _problem(rng)
    _, ctx = ref.forward(x, y, k=9, **case)
    gbar = rng.normal(size=ctx["pred"].shape)
    want = ref.backward(ctx, gbar)

    def f(xj):
        return jnp.sum(laplace_learning(xj, jnp.asarray(y), k=9, **case)
                       * jnp.asarray(gbar))

    got = np.asarray(jax.grad(f)(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-7, rtol=1e-6)


def test_cg_solver_matches_direct(rng):
    x, y, _ = _problem(rng)
    direct = np.asarray(laplace_learning(jnp.asarray(x), jnp.asarray(y),
                                         tau=0.07, k=9))
    cg = np.asarray(laplace_learning(jnp.asarray(x), jnp.asarray(y),
                                     tau=0.07, k=9, solver="cg"))
    np.testing.assert_allclose(cg, direct, atol=1e-7)


def test_cg_backward_matches_direct(rng):
    x, y, _ = _problem(rng)
    gbar = jnp.asarray(rng.normal(size=(x.shape[0] - y.shape[0], y.shape[1])))

    def loss(xj, solver):
        return jnp.sum(laplace_learning(xj, jnp.asarray(y), tau=0.07, k=9,
                                        solver=solver) * gbar)

    g_dir = np.asarray(jax.grad(lambda v: loss(v, "cholesky"))(jnp.asarray(x)))
    g_cg = np.asarray(jax.grad(lambda v: loss(v, "cg"))(jnp.asarray(x)))
    np.testing.assert_allclose(g_cg, g_dir, atol=1e-6)


def test_jit_and_grad_compose(rng):
    x, y, _ = _problem(rng, n=80, k_lab=16)

    @jax.jit
    def step(xj):
        pred = laplace_learning(xj, jnp.asarray(y), tau=0.07, k=7)
        return -jnp.mean(jnp.log(pred.max(axis=1) + 1e-8))

    val, grad = jax.value_and_grad(step)(jnp.asarray(x))
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))
