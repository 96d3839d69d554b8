"""Edge-partitioned graph parallelism: sharded SpMM + CG over a device mesh.

The reference has no distributed math at all (SURVEY.md §2.3); this module
is the TPU-native scaling path for the large transductive graphs
(utils.py:637-651, ~60k nodes, k=50, ~6M directed edges): nodes (and their
outgoing KNN edges) are partitioned across the mesh's 'graph' axis, each
device computes the contributions of ITS edges, and XLA collectives stitch
rows back together:

  * out-edge half: purely local after an ``all_gather`` of the (n, l)
    iterate (a few MB — rides ICI),
  * in-edge half: each device scatter-adds its edges' contributions into a
    full-length accumulator which is ``psum``-reduced.

The CG loop (stable_conjgrad semantics, reference GLL.py:247-276) runs
inside ``shard_map``; its alpha/beta reductions are node-axis partial sums
followed by psums, so every iterate stays sharded.  All shapes are static;
node count is padded to a multiple of the axis size.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.graph import BatchGraph
from ..ops.knn import knn_tiled

__all__ = ["sharded_laplace_solve", "sharded_transductive_laplace"]


def _build_edges(x, knn_num, epsilon, block):
    """Host-of-mesh graph build (tiled exact KNN) producing the static
    (n, k) structure used by the sharded solver."""
    import graphlearninglayer_tpu.ops.graph as graph_mod

    return graph_mod.build_graph(x, knn_num, epsilon, tiled=True, block=block)


def sharded_laplace_solve(mesh: Mesh, g: BatchGraph, y: jax.Array,
                          tau: float, axis: str = "graph",
                          tol: float = 1e-10, max_iter: int = 10_000):
    """Solve (Luu + tau I) P = W_ul Y with node/edge-sharded CG.

    g is the symmetrized KNN graph over n nodes (labeled rows first);
    y is (k_lab, l).  Returns (m, l) predictions, numerically matching the
    single-device Jacobi-preconditioned path (ops/transductive.py).
    n must be divisible by the mesh axis size (pad upstream).
    """
    n, k = g.nbr.shape
    k_lab, l = y.shape
    nd = mesh.shape[axis]
    if n % nd:
        raise ValueError(f"node count {n} not divisible by axis size {nd}")

    eps_i = g.eps[:, None]
    eps_j = g.eps[g.nbr]
    inv = 1.0 / (eps_i * eps_j)
    w_edge = jnp.exp(-4.0 * g.dist2 * inv) * g.coef  # coef folded in

    labeled_mask = (jnp.arange(n) < k_lab).astype(w_edge.dtype)

    def spmm_local(w_loc, nbr_loc, x_full, rows_loc):
        """This shard's contribution to W @ x (full length, to be psummed):
        out-edges accumulate into local rows, in-edges scatter into a
        full-length buffer."""
        out_rows = jnp.einsum("nk,nkl->nl", w_loc, x_full[nbr_loc])
        contrib = (w_loc[:, :, None] * x_full[rows_loc][:, None, :])
        scat = jnp.zeros((n, x_full.shape[1]), x_full.dtype)
        scat = scat.at[nbr_loc.reshape(-1)].add(
            contrib.reshape(-1, x_full.shape[1]))
        full = scat.at[rows_loc].add(out_rows)
        return full

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis), P(axis), P(None)),
             out_specs=P(axis))
    def solve(w_loc, nbr_loc, rows_loc, y_full):
        # degree: full-length psum of this shard's row sums
        ones = jnp.ones((n, 1), w_loc.dtype)
        deg = jax.lax.psum(spmm_local(w_loc, nbr_loc, ones, rows_loc),
                           axis)[:, 0]
        diag = deg + jnp.asarray(tau, w_loc.dtype)
        mscale = jnp.where(jnp.arange(n) >= k_lab,
                           1.0 / jnp.sqrt(diag + 1e-10), 0.0)

        # rhs = M * (W_ul @ Y) on unlabeled rows
        y_pad = y_full * labeled_mask[:, None]
        wy = jax.lax.psum(spmm_local(w_loc, nbr_loc, y_pad, rows_loc), axis)
        b = mscale[:, None] * wy

        unlabeled = (jnp.arange(n) >= k_lab).astype(w_loc.dtype)[:, None]

        def matvec(p):  # p: (n, l) replicated; zero on labeled rows
            q = mscale[:, None] * p
            wq = jax.lax.psum(spmm_local(w_loc, nbr_loc, q, rows_loc), axis)
            return (mscale * diag * mscale)[:, None] * p \
                - (mscale[:, None] * wq * unlabeled)

        # stable_conjgrad with masked per-column updates (GLL.py:247-276)
        tol_a = jnp.asarray(tol, w_loc.dtype)
        x0 = jnp.zeros_like(b)
        r0 = b - matvec(x0)
        rs0 = jnp.sum(r0 * r0, axis=0)

        def cond(state):
            _, _, _, rs, err, i = state
            return (err > tol_a) & (i < max_iter)

        def body(state):
            xk, r, p, rsold, _, i = state
            ap = matvec(p)
            pap = jnp.sum(p * ap, axis=0)
            live = rsold > tol_a * tol_a
            alpha = jnp.where(live, rsold / jnp.where(live, pap, 1.0), 0.0)
            xk = xk + alpha * p
            r = r - alpha * ap
            rsnew = jnp.sum(r * r, axis=0)
            err = jnp.sqrt(jnp.max(rsnew))
            livenew = rsnew > tol_a * tol_a
            beta = jnp.where(livenew,
                             rsnew / jnp.where(livenew, rsold, 1.0), 0.0)
            p = r + beta * p
            return xk, r, p, rsnew, err, i + 1

        err0 = jnp.sqrt(jnp.max(rs0))
        z, *_ = jax.lax.while_loop(
            cond, body, (x0, r0, r0, rs0, err0, jnp.asarray(0, jnp.int32)))
        pred_full = mscale[:, None] * z
        # return this shard's slice of the full solution
        me = jax.lax.axis_index(axis)
        return jax.lax.dynamic_slice_in_dim(pred_full, me * (n // nd),
                                            n // nd, axis=0)

    rows = jnp.arange(n, dtype=jnp.int32)
    y_full = jnp.zeros((n, l), w_edge.dtype).at[:k_lab].set(y)
    pred_full = solve(w_edge, g.nbr, rows, y_full)
    return pred_full[k_lab:]


def sharded_transductive_laplace(mesh: Mesh, x, y, knn_num: int = 50,
                                 epsilon="auto", tau: float = 1e-8,
                                 knn_block: int = 2048,
                                 axis: str = "graph"):
    """Mesh-sharded equivalent of ops.transductive.transductive_laplace.

    Graph build runs replicated (tiled exact KNN — itself one big sharded
    matmul under GSPMD); the CG solve is edge-partitioned.  Node count is
    padded to a multiple of the axis size with isolated dummy nodes.
    """
    n = x.shape[0]
    nd = mesh.shape[axis]
    pad = (-n) % nd
    if pad:
        # far-away dummy nodes: isolated from the real graph and from the
        # labeled set, so they do not perturb the solution on real nodes
        far = jnp.max(jnp.abs(x)) * 1e3 + 1e3
        fill = far * (1.0 + jnp.arange(pad, dtype=x.dtype)[:, None])
        x = jnp.concatenate(
            [x, jnp.broadcast_to(fill, (pad, x.shape[1]))], axis=0)
    g = _build_edges(x, knn_num, epsilon, knn_block)
    pred = sharded_laplace_solve(mesh, g, y, tau, axis)
    m = n - y.shape[0]
    return pred[:m]
