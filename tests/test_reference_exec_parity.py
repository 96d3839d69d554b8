"""Verbatim-reference execution parity.

Runs the ACTUAL reference op — ``LaplaceLearningSparseHard`` from
``/root/reference/GLL.py`` (imported read-only, executed under torch CPU) —
and asserts the TPU op agrees on forward predictions and input gradients for
every tau/epsilon convention the drivers use.  This removes the
oracle-circularity risk of testing only against our own scipy oracle
(tests/oracle/reference_op.py): here the reference source itself computes
the expected values.

The reference touches its ``graphlearning`` dependency in exactly two
places, both stubbed here with small auditable equivalents:

* ``gl.weightmatrix.knnsearch(data, k, similarity='euclidean',
  method='annoy')`` (GLL.py:183) — Annoy approximate euclidean KNN with
  self as first neighbor.  Stub: exact brute-force KNN (float64), which is
  the canonical target both implementations approximate; identical
  neighbor sets are required for a meaningful numeric comparison.
* ``gl.graph(-V).gradient(u)`` (GLL.py:111-120) — the sparse
  edge-difference operator on the pattern of the weight matrix:
  ``grad(u)[i, j] = u[j] - u[i]`` for every stored entry (i, j).

Everything else (symmetrization, W/V/mod_V/C assembly, scipy spsolve,
implicit-differentiation backward incl. the auto-eps extra term, torch
sparse products) is the reference's own code running unmodified.
"""
from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from graphlearninglayer_tpu.ops import laplace_learning
from tests.oracle import reference_op as oracle

torch = pytest.importorskip("torch")

REFERENCE_GLL = "/root/reference/GLL.py"


def _knnsearch(data, k, similarity="euclidean", method="annoy", **kwargs):
    """Exact euclidean KNN: (ind, dist), each (n, k), self first."""
    assert similarity == "euclidean"
    x = np.asarray(data, np.float64)
    d2 = (np.sum(x * x, 1)[:, None] + np.sum(x * x, 1)[None, :]
          - 2.0 * x @ x.T)
    np.fill_diagonal(d2, -1.0)  # pin self strictly first
    order = np.argsort(d2, axis=1, kind="stable")[:, :k]
    dist2 = np.maximum(np.take_along_axis(d2, order, axis=1), 0.0)
    return order, np.sqrt(dist2)


class _Graph:
    """gl.graph stand-in: only the .gradient() the reference backward uses."""

    def __init__(self, weight_matrix):
        self.weight_matrix = sp.csr_matrix(weight_matrix)

    def gradient(self, u):
        a = self.weight_matrix.tocoo()
        u = np.asarray(u).ravel()
        vals = u[a.col] - u[a.row]
        return sp.coo_matrix((vals, (a.row, a.col)), shape=a.shape).tocsr()


@pytest.fixture(scope="module")
def reference_gll():
    glmod = types.ModuleType("graphlearning")
    wm = types.ModuleType("graphlearning.weightmatrix")
    wm.knnsearch = _knnsearch
    glmod.weightmatrix = wm
    glmod.graph = _Graph
    saved = {name: sys.modules.get(name)
             for name in ("graphlearning", "graphlearning.weightmatrix")}
    sys.modules["graphlearning"] = glmod
    sys.modules["graphlearning.weightmatrix"] = wm
    try:
        spec = importlib.util.spec_from_file_location("reference_gll",
                                                      REFERENCE_GLL)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        for name, val in saved.items():
            if val is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = val


def _problem(rng, n=140, d=12, k_lab=30, l=5):
    # float32 inputs: the regime the reference actually runs in (network
    # features), and required because its backward materializes the sparse
    # gradient operator via torch.FloatTensor (GLL.py:134,154)
    x = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.integers(0, l, size=k_lab)
    y = oracle.one_hot(labels, l).astype(np.float32)
    return x, y


CASES = [
    dict(tau=0.07, epsilon="auto"),   # FullySup convention (temp-as-tau)
    dict(tau=0.0, epsilon="auto"),    # adversarial-driver convention
    dict(tau=1e-8, epsilon="auto"),   # numpy eval convention
    dict(tau=0.05, epsilon=1.0),      # fixed-bandwidth mode
]

K_REF = 25  # the reference op hardcodes k=25 (GLL.py:27)


def _run_reference(reference_gll, x, y, tau, epsilon, gbar):
    xt = torch.tensor(x, requires_grad=True)
    yt = torch.tensor(y)
    pred = reference_gll.LaplaceLearningSparseHard.apply(xt, yt, tau, epsilon)
    loss = (pred * torch.tensor(gbar, dtype=pred.dtype)).sum()
    loss.backward()
    return pred.detach().numpy(), xt.grad.detach().numpy()


@pytest.mark.parametrize("case", CASES)
def test_reference_exec_parity(reference_gll, rng, case):
    x, y = _problem(rng)
    m, l = x.shape[0] - y.shape[0], y.shape[1]
    gbar = rng.normal(size=(m, l)).astype(np.float32)

    want_pred, want_grad = _run_reference(reference_gll, x, y,
                                          case["tau"], case["epsilon"], gbar)

    def f(xj):
        return jnp.sum(laplace_learning(xj, jnp.asarray(y, jnp.float64),
                                        k=K_REF, **case)
                       * jnp.asarray(gbar, jnp.float64))

    xj = jnp.asarray(x, jnp.float64)
    got_pred = np.asarray(laplace_learning(xj, jnp.asarray(y, jnp.float64),
                                           k=K_REF, **case))
    got_grad = np.asarray(jax.grad(f)(xj))

    # forward: reference solves in float64 scipy given the same float32
    # feature values -> tight agreement expected
    np.testing.assert_allclose(got_pred, want_pred, rtol=1e-6, atol=1e-8)
    # backward: the reference casts the sparse gradient operators to
    # float32 (torch.FloatTensor) before the final products -> float32-level
    # agreement is the best possible
    scale = np.abs(want_grad).max()
    np.testing.assert_allclose(got_grad, want_grad,
                               rtol=1e-4, atol=1e-5 * max(scale, 1e-3))


@pytest.mark.parametrize("case", CASES[:2])
def test_oracle_matches_reference_exec(reference_gll, rng, case):
    """The scipy oracle used by the wider parity suite agrees with the
    reference source executed verbatim (closes the oracle-circularity gap)."""
    x, y = _problem(rng)
    m, l = x.shape[0] - y.shape[0], y.shape[1]
    gbar = rng.normal(size=(m, l)).astype(np.float32)

    want_pred, want_grad = _run_reference(reference_gll, x, y,
                                          case["tau"], case["epsilon"], gbar)
    pred, ctx = oracle.forward(x.astype(np.float64), y.astype(np.float64),
                               k=K_REF, **case)
    grad = oracle.backward(ctx, gbar.astype(np.float64))

    np.testing.assert_allclose(pred, want_pred, rtol=1e-6, atol=1e-8)
    scale = np.abs(want_grad).max()
    np.testing.assert_allclose(grad, want_grad,
                               rtol=1e-4, atol=1e-5 * max(scale, 1e-3))
