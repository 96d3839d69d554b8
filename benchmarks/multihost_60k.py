"""Multi-process edge-sharded transductive eval at the REAL 60k shape.

VERDICT r4 item 3: the 2-process production eval path
(parallel/edge_shard.py `_globalize` / gather_out all_gathers /
check_vma=False branches) had only ever run at toy scale
(tests/multihost_driver_child.py).  This runner executes it at the
dress-rehearsal eval shape — n=60,250 nodes, k=50, d=128, 250 labeled —
across TWO OS processes x 4 CPU devices under jax.distributed, and:

  * asserts numerics equality vs the single-device `sorted` solve
    (same features, same labels) with a recorded bound;
  * runs TWO consecutive evals on drifted features so the round-4
    shard_perm reuse + CG warm start execute multi-process (asserts the
    cached permutation object is reused and warm-start cuts CG iters);
  * archives the plan's halo stats + timings to
    benchmarks/multihost_60k/summary.json.

Roles: no args = parent (generates data, computes the single-device
references, spawns the children, writes the summary); `--child PID NPROC
COORD DATADIR` = child.  CPU-only (the sharding program is identical on
TPU; multi-chip hardware is unavailable here — CLAUDE.md).

Usage: python benchmarks/multihost_60k.py [n] [k]   (defaults 60250, 50)
"""
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DEFAULT, K_DEFAULT = 60_250, 50
D, L, K_LAB = 128, 10, 250
KNN_BLOCK = 512          # 2-core host: keep the per-device panel <~128MB
DRIFT = 0.02             # feature drift between the two evals


def gen_features(n, seed=0):
    """Clustered unit-norm features like an encoder's (probe_edge_shard_
    stats.py family) + a drifted second eval's view."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(L, D)).astype(np.float32) * 2.0
    lab = rng.integers(0, L, n)
    x = centers[lab] + rng.normal(size=(n, D)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x2 = x + DRIFT * rng.normal(size=x.shape).astype(np.float32)
    x2 /= np.linalg.norm(x2, axis=1, keepdims=True)
    y = np.zeros((K_LAB, L), np.float32)
    y[np.arange(K_LAB), lab[:K_LAB]] = 1.0
    return x, x2, y


def child(pid, nproc, coord, datadir):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)

    import numpy as np

    from graphlearninglayer_tpu.ops.transductive import EvalGraphCache
    from graphlearninglayer_tpu.parallel.multihost import (
        global_mesh, initialize_multihost)
    from graphlearninglayer_tpu.parallel.edge_shard import (
        edge_sharded_transductive_laplace)

    ok = initialize_multihost(coordinator=coord, num_processes=nproc,
                              process_id=pid)
    assert ok and jax.process_count() == nproc
    mesh = global_mesh(axes=("graph",))
    nd = mesh.devices.size
    dat = np.load(os.path.join(datadir, "data.npz"))
    x1, x2, y = dat["x1"], dat["x2"], dat["y"]
    ref1, ref2 = dat["ref1"], dat["ref2"]

    cache = EvalGraphCache()
    t0 = time.perf_counter()
    pred1, stats, it1, err1 = edge_sharded_transductive_laplace(
        mesh, x1, y, knn_num=int(dat["k"]), epsilon="auto", tau=1e-8,
        knn_block=KNN_BLOCK, return_stats=True, return_info=True,
        cache=cache)
    t1 = time.perf_counter() - t0
    e1 = float(np.max(np.abs(np.asarray(pred1) - ref1)))

    perm_obj = cache.shard_perm
    assert perm_obj is not None and cache.shard_nd == nd

    t0 = time.perf_counter()
    pred2, _, it2, err2 = edge_sharded_transductive_laplace(
        mesh, x2, y, knn_num=int(dat["k"]), epsilon="auto", tau=1e-8,
        knn_block=KNN_BLOCK, return_stats=True, return_info=True,
        cache=cache)
    t2 = time.perf_counter() - t0
    e2 = float(np.max(np.abs(np.asarray(pred2) - ref2)))

    # the round-4 cross-eval reuse must have actually fired multi-process:
    # the second call takes the cache_ok branch, which reuses (and then
    # re-stores) the SAME permutation array object — a fresh argsort would
    # be a different object
    assert cache.shard_perm is perm_obj, "shard_perm was rebuilt on eval 2"
    assert it2 < it1, f"warm start did not cut CG iters ({it1} -> {it2})"
    assert e1 < 1e-4 and e2 < 1e-4, (e1, e2)

    if pid == 0:
        out = dict(n=int(stats["n"]), nd=int(stats["nd"]),
                   n_loc=int(stats["n_loc"]), n_ext=int(stats["n_ext"]),
                   e_cap=int(stats["e_cap"]),
                   ring_caps=[int(v) for v in stats["ring_caps"]],
                   halo_frac=float(stats["halo_frac"]),
                   max_err_eval1=e1, max_err_eval2=e2,
                   cg_iters_eval1=it1, cg_iters_eval2=it2,
                   wall_s_eval1=round(t1, 2), wall_s_eval2=round(t2, 2),
                   processes=nproc, devices=nd, k=int(dat["k"]),
                   d=D, k_lab=K_LAB, drift=DRIFT)
        with open(os.path.join(datadir, "summary.json"), "w") as f:
            json.dump(out, f, indent=1)
    print(f"MULTIHOST60K_OK pid={pid} err1={e1:.2e} err2={e2:.2e} "
          f"iters={it1}->{it2} wall={t1:.0f}s/{t2:.0f}s", flush=True)


def parent(n, k):
    import numpy as np

    outdir = os.environ.get(
        "GLL_MH60K_OUT", os.path.join(REPO, "benchmarks", "multihost_60k"))
    os.makedirs(outdir, exist_ok=True)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from graphlearninglayer_tpu.ops import transductive_laplace

    x1, x2, y = gen_features(n)
    print(f"[parent] n={n} k={k}: single-device references...", flush=True)
    t0 = time.perf_counter()
    ref1 = np.asarray(transductive_laplace(
        jnp.asarray(x1), jnp.asarray(y), knn_num=k, mode="sorted"))
    ref2 = np.asarray(transductive_laplace(
        jnp.asarray(x2), jnp.asarray(y), knn_num=k, mode="sorted"))
    print(f"[parent] references done in {time.perf_counter()-t0:.0f}s",
          flush=True)
    np.savez(os.path.join(outdir, "data.npz"),
             x1=x1, x2=x2, y=y, ref1=ref1, ref2=ref2, k=k)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        coord = f"localhost:{s.getsockname()[1]}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (env.get("PYTHONPATH", ""), REPO) if p)
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", str(pid),
         "2", coord, outdir],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=3600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    ok = True
    for pid, (p, out) in enumerate(zip(procs, outs)):
        tail = "\n".join(out.splitlines()[-12:])
        print(f"--- child {pid} (rc={p.returncode}) ---\n{tail}")
        ok &= p.returncode == 0 and "MULTIHOST60K_OK" in out
    # the 180MB input bundle has served its purpose; keep the summary only
    os.remove(os.path.join(outdir, "data.npz"))
    if ok:
        with open(os.path.join(outdir, "summary.json")) as f:
            print(f.read())
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], sys.argv[5])
    else:
        n = int(sys.argv[1]) if len(sys.argv) > 1 else N_DEFAULT
        k = int(sys.argv[2]) if len(sys.argv) > 2 else K_DEFAULT
        parent(n, k)
