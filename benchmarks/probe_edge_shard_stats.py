"""Working-set accounting for the edge-partitioned sharded solve.

Runs ``edge_sharded_transductive_laplace(return_stats=True)`` on the
8-virtual-device CPU mesh (multi-chip TPU hardware is unavailable here; the
sharding/collective program is identical) over clustered features at a
transductive-eval-like shape and reports the plan's memory accounting:

  halo_frac          fraction of all rows any shard must import per matvec
  rows_per_device    n/P local rows + P*halo_cap halo buffer
  sharded_bytes      per-device slot lists + iterate + halo buffer
  replicated_bytes   the graph_shard.py all-gather design's per-device cost

and cross-checks the solution against the single-device transductive path.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python benchmarks/probe_edge_shard_stats.py [n] [k]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    d, l, k_lab = 128, 10, 250

    from graphlearninglayer_tpu.ops import transductive_laplace
    from graphlearninglayer_tpu.parallel import make_mesh
    from graphlearninglayer_tpu.parallel.edge_shard import (
        edge_sharded_transductive_laplace)

    rng = np.random.default_rng(0)
    centers = rng.normal(size=(l, d)).astype(np.float32) * 2.0
    lab = rng.integers(0, l, n)
    x = centers[lab] + rng.normal(size=(n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    y = np.zeros((k_lab, l), np.float32)
    y[np.arange(k_lab), lab[:k_lab]] = 1.0
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    mesh = make_mesh(8, axes=("graph",))
    t0 = time.perf_counter()
    pred, stats = edge_sharded_transductive_laplace(
        mesh, xj, yj, knn_num=k, epsilon="auto", tau=1e-8,
        return_stats=True)
    pred = np.asarray(pred)
    t_sharded = time.perf_counter() - t0

    print(f"n={stats['n']} devices={stats['nd']} n_loc={stats['n_loc']} "
          f"edges/shard<={stats['e_cap']} n_ext={stats['n_ext']} "
          f"ring_caps={stats['ring_caps']}")
    print(f"halo_frac={stats['halo_frac']:.4f} "
          f"rows_per_device={stats['rows_per_device']} "
          f"(replicated design: {stats['n']})")
    ratio = stats["sharded_bytes"] / stats["replicated_bytes"]
    print(f"per-device matvec working set: {stats['sharded_bytes']/2**20:.1f}"
          f" MiB sharded vs {stats['replicated_bytes']/2**20:.1f} MiB "
          f"replicated = {ratio:.3f} (target < 2/8 = 0.25)")

    ref = np.asarray(transductive_laplace(xj, yj, knn_num=k, mode="sorted"))
    err = float(np.max(np.abs(pred - ref)))
    print(f"max |sharded - single-device| = {err:.2e} "
          f"(wall {t_sharded:.1f}s incl. compile)")
    assert err < 1e-4


if __name__ == "__main__":
    main()
