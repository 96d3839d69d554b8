"""CPU probe: block-structure statistics of the 60k KNN graph under a
cluster reordering — sizes the BSR slot budget + overflow split.

Pure numpy (no TPU, safe to run alongside device jobs).
"""
import sys
import time

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    block = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    d, l = 128, 10
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(l, d)).astype(np.float32) * 2.0
    lab = rng.integers(0, l, n)
    x = centers[lab] + rng.normal(size=(n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)

    # exact KNN, chunked
    t0 = time.time()
    nrm = (x * x).sum(1)
    nbr = np.empty((n, k), np.int32)
    for s in range(0, n, 2048):
        e = min(s + 2048, n)
        d2 = nrm[s:e, None] + nrm[None, :] - 2.0 * (x[s:e] @ x.T)
        idx = np.argpartition(d2, k, axis=1)[:, :k + 1]
        dd = np.take_along_axis(d2, idx, 1)
        o = np.argsort(dd, 1)
        nbr[s:e] = np.take_along_axis(idx, o, 1)[:, 1:k + 1]
    print(f"knn {time.time()-t0:.1f}s")

    # k-means ordering
    n_clusters = max(8, min(512, n // 1024))
    cent = x[::max(n // n_clusters, 1)][:n_clusters].copy()
    for _ in range(8):
        a = np.argmax(x @ cent.T - 0.5 * (cent * cent).sum(1), 1)
        for c in range(n_clusters):
            m = a == c
            if m.any():
                cent[c] = x[m].mean(0)
    a = np.argmax(x @ cent.T - 0.5 * (cent * cent).sum(1), 1)
    sizes = np.bincount(a, minlength=n_clusters)
    print(f"clusters: {n_clusters}, sizes p50={np.median(sizes):.0f} "
          f"max={sizes.max()} empty={(sizes == 0).sum()}")
    print(f"kmeans vs true labels: purity="
          f"{sum(np.bincount(lab[a == c]).max() for c in range(n_clusters) if (a == c).any()) / n:.3f}")

    perm = np.argsort(a, kind="stable")
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)

    src = np.repeat(np.arange(n), k)
    dst = inv[nbr.reshape(-1)]
    src = inv[src]
    rows = np.concatenate([src, dst])
    cols = np.concatenate([dst, src])
    bi, bj = rows // block, cols // block
    r_blk = -(-n // block)
    key = bi * r_blk + bj
    ukey, counts = np.unique(key, return_counts=True)
    ubi = ukey // r_blk
    bpr = np.bincount(ubi, minlength=r_blk)
    print(f"block={block}: R={r_blk}, nnz blocks={len(ukey)}, "
          f"blocks/row mean={bpr.mean():.1f} p50={np.median(bpr):.0f} "
          f"p90={np.percentile(bpr, 90):.0f} p99={np.percentile(bpr, 99):.0f} "
          f"max={bpr.max()}")
    print(f"edges/block mean={counts.mean():.1f} p50={np.median(counts):.0f}")
    # edges covered vs slot cap: per block-row keep the cap densest blocks
    order = np.lexsort((-counts, ubi))
    rank = np.arange(len(ukey)) - np.searchsorted(ubi[order], ubi[order])
    cnt_sorted = counts[order]
    tot = 2 * len(nbr.reshape(-1))
    for cap in (16, 24, 32, 48, 64, 96, 128):
        kept = cnt_sorted[rank < cap].sum()
        tile_gb = r_blk * block * cap * block * 4 / 2**30
        print(f"  cap={cap:4d}: tiles={tile_gb:6.2f} GiB  "
              f"edge coverage={kept / tot * 100:6.2f}%  "
              f"overflow={(tot - kept):,}")
    # hubness
    indeg = np.bincount(nbr.reshape(-1), minlength=n)
    print(f"in-degree: mean={indeg.mean():.0f} p99={np.percentile(indeg, 99):.0f} "
          f"max={indeg.max()}")


if __name__ == "__main__":
    main()
