"""Pallas TPU kernels for the dense graph path.

``fused_affinity`` computes the masked affinity matrix
    W[i, j] = mask[i, j] * exp(-4 ||x_i - x_j||^2 / (eps_i eps_j))
in one pass: each (TM, TN) output tile runs the distance matmul on the MXU
and applies the bandwidth/exponential/mask elementwise on the VPU, without
materializing the squared-distance matrix in HBM.  This fuses the two
n x n passes of the XLA dense path (pairwise_dist2 -> affinity) into one
HBM write.

Used by ops/dense_mode.py when ``use_pallas=True``; the jnp formulation is
the oracle (tests/test_pallas_kernels.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_affinity", "fused_affinity_sym"]


def _affinity_sym_kernel(x_ref, xt_ref, sq_ref, sqt_ref, eps_ref, epst_ref,
                         m_ref, mt_ref, w_ref):
    """Like the plain kernel, but the union-symmetrized edge mask is formed
    in-kernel from the raw one-direction KNN indicator M: this tile reads
    M[i-tile, j-tile] and M[j-tile, i-tile] and uses max(M, M^T) with the
    self/zero-distance exclusions — so no n x n mask post-processing passes
    (transpose, max, multiplies) ever hit HBM."""
    cross = jax.lax.dot_general(
        x_ref[:], xt_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    d2 = jnp.maximum(sq_ref[:] + sqt_ref[:] - 2.0 * cross, 0.0)
    mask = jnp.maximum(m_ref[:], mt_ref[:].T)
    tm, tn = mask.shape
    rows = (jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 0)
            + pl.program_id(0) * tm)
    cols = (jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1)
            + pl.program_id(1) * tn)
    mask = jnp.where((rows != cols) & (d2 > 0.0), mask, 0.0)
    inv = 1.0 / (eps_ref[:] * epst_ref[:])
    w_ref[:] = jnp.exp(-4.0 * d2 * inv) * mask


@functools.partial(jax.jit, static_argnames=("tm", "tn", "interpret"))
def fused_affinity_sym(x: jax.Array, eps: jax.Array, m_raw: jax.Array,
                       tm: int = 256, tn: int = 256,
                       interpret: bool = False) -> jax.Array:
    """Masked symmetrized affinity W (n, n) from features, bandwidths and
    the RAW directed-KNN indicator ``m_raw`` (m_raw[i, nbr[i]] = 1)."""
    if tm != tn:
        raise ValueError("fused_affinity_sym requires square tiles")
    n0 = x.shape[0]
    pad = (-n0) % max(tm, tn)
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        eps = jnp.pad(eps, (0, pad), constant_values=1.0)
        m_raw = jnp.pad(m_raw, ((0, pad), (0, pad)))
    n, d = x.shape
    sq = jnp.sum(x * x, axis=1, keepdims=True)
    xt = x.T
    sqt = sq.reshape(1, n)
    eps_col = eps.reshape(n, 1)
    eps_row = eps.reshape(1, n)

    grid = (n // tm, n // tn)
    w = pl.pallas_call(
        _affinity_sym_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            # the transposed-position tile of the same raw indicator
            pl.BlockSpec((tn, tm), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        interpret=interpret,
    )(x, xt, sq, sqt, eps_col, eps_row, m_raw, m_raw)
    return w[:n0, :n0] if pad else w


def _affinity_kernel(x_ref, xt_ref, sq_ref, sqt_ref, eps_ref, epst_ref,
                     mask_ref, w_ref):
    # squared distances for this tile via the MXU
    cross = jax.lax.dot_general(
        x_ref[:], xt_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    d2 = sq_ref[:] + sqt_ref[:] - 2.0 * cross
    d2 = jnp.maximum(d2, 0.0)
    inv = 1.0 / (eps_ref[:] * epst_ref[:])
    w_ref[:] = jnp.exp(-4.0 * d2 * inv) * mask_ref[:]


@functools.partial(jax.jit, static_argnames=("tm", "tn", "interpret"))
def fused_affinity(x: jax.Array, eps: jax.Array, mask: jax.Array,
                   tm: int = 256, tn: int = 256,
                   interpret: bool = False) -> jax.Array:
    """Masked affinity W (n, n) from features (n, d), bandwidths (n,), and a
    {0,1} edge mask (n, n).  Arbitrary n (padded internally to the tile
    grid; padded rows carry mask 0 so W is exactly zero there).
    ``interpret=True`` runs the kernel in the Pallas interpreter (for CPU
    tests)."""
    n0 = x.shape[0]
    pad = (-n0) % max(tm, tn)
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        eps = jnp.pad(eps, (0, pad), constant_values=1.0)
        mask = jnp.pad(mask, ((0, pad), (0, pad)))
    n, d = x.shape
    sq = jnp.sum(x * x, axis=1, keepdims=True)          # (n, 1)
    xt = x.T                                            # (d, n)
    sqt = sq.reshape(1, n)
    eps_col = eps.reshape(n, 1)
    eps_row = eps.reshape(1, n)

    grid = (n // tm, n // tn)
    w = pl.pallas_call(
        _affinity_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        interpret=interpret,
    )(x, xt, sq, sqt, eps_col, eps_row, mask)
    return w[:n0, :n0] if pad else w
