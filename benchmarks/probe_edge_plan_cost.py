"""Wall-clock cost of ``build_edge_shard_plan`` (the host-side one-time
plan of the edge-partitioned solver) at transductive-eval shapes.

Pure host numpy — no device needed.  The KNN structure is synthesized
cluster-local (most neighbors within a +-window around each row, a small
fraction global) to mimic the post-k-means permutation locality that the
real pipeline produces, so the halo tables have realistic shapes.

Usage: python benchmarks/probe_edge_plan_cost.py [n] [k] [nd] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth_knn(n: int, k: int, window: int = 500, remote_frac: float = 0.05,
              seed: int = 0):
    rng = np.random.default_rng(seed)
    rows = np.arange(n)[:, None]
    off = rng.integers(-window, window + 1, size=(n, k - 1))
    nbr = np.clip(rows + off, 0, n - 1)
    remote = rng.random((n, k - 1)) < remote_frac
    nbr = np.where(remote, rng.integers(0, n, size=(n, k - 1)), nbr)
    nbr = np.concatenate([rows, nbr], axis=1).astype(np.int32)
    dist2 = np.sort(rng.random((n, k)).astype(np.float32), axis=1)
    dist2[:, 0] = 0.0   # self
    return nbr, dist2


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    nd = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    l, k_lab = 10, 250

    from graphlearninglayer_tpu.parallel.edge_shard import (
        build_edge_shard_plan)

    nbr, dist2 = synth_knn(n, k)
    rng = np.random.default_rng(1)
    y_full = np.zeros((n, l), np.float32)
    labeled = rng.choice(n, k_lab, replace=False)
    y_full[labeled, rng.integers(0, l, k_lab)] = 1.0

    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        plan = build_edge_shard_plan(nbr, dist2, y_full, labeled, nd,
                                     tau=1e-8, epsilon="auto",
                                     dtype=np.float32)
        times.append(time.perf_counter() - t0)
    s = plan.stats
    print(f"n={n} k={k} nd={nd}: plan "
          f"{min(times):.2f}s (best of {reps}; {times})")
    print(f"  S={s['S']} hcap={s['hcap']} ov_cap={s['ov_cap']} "
          f"halo_frac={s['halo_frac']:.4f} "
          f"rows/dev={s['rows_per_device']}")


if __name__ == "__main__":
    main()
