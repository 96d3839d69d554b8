import jax.numpy as jnp
import numpy as np

from graphlearninglayer_tpu.ops import (cholesky_factor, cholesky_solve,
                                        stable_conjgrad)


def _spd(rng, m):
    a = rng.normal(size=(m, m))
    return a @ a.T + m * np.eye(m)


def test_cholesky_solve(rng):
    a = _spd(rng, 50)
    b = rng.normal(size=(50, 4))
    got = np.asarray(cholesky_solve(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, np.linalg.solve(a, b), atol=1e-8)


def test_factor_reuse(rng):
    a = _spd(rng, 30)
    f = cholesky_factor(jnp.asarray(a))
    for _ in range(3):
        b = rng.normal(size=(30, 2))
        np.testing.assert_allclose(np.asarray(f.solve(jnp.asarray(b))),
                                   np.linalg.solve(a, b), atol=1e-8)


def test_stable_conjgrad_matches_direct(rng):
    a = _spd(rng, 80)
    b = rng.normal(size=(80, 6))
    aj = jnp.asarray(a)
    got = np.asarray(stable_conjgrad(lambda p: aj @ p, jnp.asarray(b)))
    np.testing.assert_allclose(got, np.linalg.solve(a, b), atol=1e-7)


def test_stable_conjgrad_column_masking(rng):
    # one RHS column exactly zero: masked alpha must keep it at zero
    a = _spd(rng, 40)
    b = rng.normal(size=(40, 3))
    b[:, 1] = 0.0
    got = np.asarray(stable_conjgrad(lambda p: jnp.asarray(a) @ p,
                                     jnp.asarray(b)))
    assert np.all(got[:, 1] == 0.0)
    np.testing.assert_allclose(got[:, [0, 2]],
                               np.linalg.solve(a, b[:, [0, 2]]), atol=1e-7)


def test_transductive_nonconvergence_warning(capsys):
    """The reference's 'max iter reached' CG warning (GLL.py:273-274) is
    surfaced host-side by the eval wrapper."""
    import jax.numpy as jnp

    from graphlearninglayer_tpu.ops.transductive import _finish

    out = _finish((jnp.ones((3, 2)), jnp.asarray(7), jnp.asarray(1e-3)))
    assert out.shape == (3, 2)
    assert "max iter reached" in capsys.readouterr().out
    _finish((jnp.ones((3, 2)), jnp.asarray(7), jnp.asarray(1e-12)))
    assert "max iter" not in capsys.readouterr().out
