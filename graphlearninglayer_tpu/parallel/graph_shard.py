"""Row-partitioned graph parallelism: sharded SpMM + CG over a device mesh.

The reference has no distributed math at all (SURVEY.md §2.3); this module
is the TPU-native scaling path for the large transductive graphs
(utils.py:637-651, ~60k nodes, k=50, ~6M directed edges).

Layout: the symmetric union-edge matrix is first converted to its combined
ELL form (ops/graph.py ``build_sym_ell``: per row, all out- AND in-edges as
padded slot lists).  Rows — and therefore all slots that produce them —
partition cleanly across the mesh's 'graph' axis, so a distributed matvec
is:

    all_gather the (n_loc, l) iterate over ICI  →  (n, l) replicated
    gather + slot-reduce the LOCAL rows          (scatter-free, no psum of
                                                  full-length buffers)

The CG loop (stable_conjgrad semantics, reference GLL.py:247-276) runs
inside ``shard_map``; its alpha/beta reductions are node-axis partial sums
followed by (l,)-sized psums, so every iterate stays sharded.  All shapes
are static; node count is padded to a multiple of the axis size upstream.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.graph import (BatchGraph, build_sym_ell, edge_weights, ell_cap,
                         max_in_degree)

__all__ = ["sharded_laplace_solve", "sharded_transductive_laplace"]


def _build_edges(x, knn_num, epsilon, block):
    """Graph build (tiled exact KNN — itself one big sharded matmul under
    GSPMD) producing the static (n, k) structure used by the sharded solver."""
    import graphlearninglayer_tpu.ops.graph as graph_mod

    return graph_mod.build_graph(x, knn_num, epsilon, tiled=True, block=block)


def sharded_laplace_solve(mesh: Mesh, g: BatchGraph, y: jax.Array,
                          tau: float, axis: str = "graph",
                          tol: float = 1e-10, max_iter: int = 10_000):
    """Solve (Luu + tau I) P = W_ul Y with row-sharded ELL CG.

    g is the symmetrized KNN graph over n nodes (labeled rows first);
    y is (k_lab, l).  Returns (m, l) predictions, numerically matching the
    single-device Jacobi-preconditioned path (ops/transductive.py).
    n must be divisible by the mesh axis size (pad upstream).
    """
    n, _ = g.nbr.shape
    k_lab, l = y.shape
    nd = mesh.shape[axis]
    if n % nd:
        raise ValueError(f"node count {n} not divisible by axis size {nd}")
    chunk = n // nd

    w, _ = edge_weights(g)
    cap = ell_cap(int(max_in_degree(g)))
    ell = build_sym_ell(g, w, cap)
    # cast BEFORE the scatter: under x64 a float64 one-hot scattered into
    # the f32 buffer trips jax's unsafe-cast FutureWarning (a hard error in
    # future releases)
    y_full = jnp.zeros((n, l), w.dtype).at[:k_lab].set(y.astype(w.dtype))

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(axis, None), P(axis, None)),
             out_specs=P(axis, None))
    def solve(nbr_loc, val_loc, y_loc):
        rows_loc = (jax.lax.axis_index(axis) * chunk
                    + jnp.arange(chunk, dtype=jnp.int32))
        deg_loc = jnp.sum(val_loc, axis=1)
        diag_loc = deg_loc + jnp.asarray(tau, val_loc.dtype)
        unlab = (rows_loc >= k_lab)
        mscale = jnp.where(unlab, 1.0 / jnp.sqrt(diag_loc + 1e-10), 0.0)

        def spmm(x_loc):
            """Local rows of W @ x: gather from the all-gathered iterate."""
            x_full = jax.lax.all_gather(x_loc, axis, tiled=True)
            return jnp.einsum("ns,nsl->nl", val_loc, x_full[nbr_loc])

        # rhs = M (W_ul Y): y is zero on unlabeled rows, M zero on labeled
        b = mscale[:, None] * spmm(y_loc)

        def matvec(p):
            """M Luu M on the unlabeled block, zero on labeled rows."""
            q = mscale[:, None] * p
            wq = spmm(q)
            return ((mscale * diag_loc * mscale)[:, None] * p
                    - mscale[:, None] * wq * unlab[:, None].astype(p.dtype))

        def gsum(v):  # global column sums: local partial + tiny psum
            return jax.lax.psum(jnp.sum(v, axis=0), axis)

        # stable_conjgrad with masked per-column updates (GLL.py:247-276)
        tol_a = jnp.asarray(tol, val_loc.dtype)
        x0 = jnp.zeros_like(b)
        r0 = b - matvec(x0)
        rs0 = gsum(r0 * r0)

        def cond(state):
            _, _, _, rs, err, i = state
            return (err > tol_a) & (i < max_iter)

        def body(state):
            xk, r, p, rsold, _, i = state
            ap = matvec(p)
            pap = gsum(p * ap)
            live = rsold > tol_a * tol_a
            alpha = jnp.where(live, rsold / jnp.where(live, pap, 1.0), 0.0)
            xk = xk + alpha * p
            r = r - alpha * ap
            rsnew = gsum(r * r)
            err = jnp.sqrt(jnp.max(rsnew))
            livenew = rsnew > tol_a * tol_a
            beta = jnp.where(livenew,
                             rsnew / jnp.where(livenew, rsold, 1.0), 0.0)
            p = r + beta * p
            return xk, r, p, rsnew, err, i + 1

        err0 = jnp.sqrt(jnp.max(rs0))
        z, *_ = jax.lax.while_loop(
            cond, body, (x0, r0, r0, rs0, err0, jnp.asarray(0, jnp.int32)))
        return mscale[:, None] * z

    pred_full = solve(ell.nbr, ell.val, y_full)
    return pred_full[k_lab:]


def sharded_transductive_laplace(mesh: Mesh, x, y, knn_num: int = 50,
                                 epsilon="auto", tau: float = 1e-8,
                                 knn_block: int = 2048,
                                 axis: str = "graph"):
    """Mesh-sharded equivalent of ops.transductive.transductive_laplace.

    Node count is padded to a multiple of the axis size with isolated dummy
    nodes (far from all data and from each other, so their affinities
    underflow to zero and they do not perturb the solution on real nodes).
    """
    n = x.shape[0]
    nd = mesh.shape[axis]
    pad = (-n) % nd
    if pad:
        far = jnp.max(jnp.abs(x)) * 1e3 + 1e3
        fill = far * (1.0 + jnp.arange(pad, dtype=x.dtype)[:, None])
        x = jnp.concatenate(
            [x, jnp.broadcast_to(fill, (pad, x.shape[1]))], axis=0)
    g = _build_edges(x, knn_num, epsilon, knn_block)
    pred = sharded_laplace_solve(mesh, g, y, tau, axis)
    m = n - y.shape[0]
    return pred[:m]
