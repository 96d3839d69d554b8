"""Measured-components model of 2-host edge-sharded eval scaling.

BASELINE.md's north star asks for >=80% edges/s scaling efficiency from one
host to two.  No second host (or even a second chip) exists in this
environment, so this probe assembles the honest substitute: a model whose
every component is MEASURED, with only the link bandwidths parameterized.

Stages (run separately — one TPU process at a time, CLAUDE.md):

  plan     (CPU, 8+16 virtual devices):
           build the 60k-node / k=50 edge-shard plan at nd=8 (one host of
           8 chips) and nd=16 (two hosts), run the REAL halo-exchange CG on
           the virtual mesh for the iteration count, and record the exact
           per-iteration communication volumes (padded all_to_all bytes,
           real halo rows, per-(q,p) pair table).      -> comm_model_r4/plan.json
  compute  (TPU):
           time the per-device local matvec at the plans' exact shapes
           (slot gather-multiply-reduce over (n_loc, S) + halo concat)
           on the real chip.                           -> comm_model_r4/compute.json
  model    combine both JSONs into the efficiency table:
             t_iter(1 host, nd=8)  = t_local(n/8)  + a2a_bytes/BW_ici
             t_iter(2 hosts, nd=16)= t_local(n/16) + max(intra/BW_ici,
                                                         cross/BW_dcn)
             efficiency = t_iter_1h / (2 * t_iter_2h)
           (conservative: no compute/comm overlap assumed; the cross-host
           bytes are the exact sum of (q, p) halo pairs whose shards live
           on different hosts under a contiguous device->host mapping).

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=16 \
      python benchmarks/probe_comm_model.py plan
  python benchmarks/probe_comm_model.py compute          # on the TPU
  python benchmarks/probe_comm_model.py model
"""
import json
import os
import sys
import time

import numpy as np

OUT_DIR = os.path.join(os.path.dirname(__file__), "comm_model_r4")
N = int(os.environ.get("GLL_COMM_N", 60_000))
K, L, D = 50, 10, 128
SEED = 7
_SUF = "" if N == 60_000 else f"_{N}"


def _features():
    # cluster tightness ~ a mid-training ResNet embedding (the diffuse
    # sigma=1.0 variant produced in-degree hubs that saturated in_cap at
    # 512 and padded the slot lists 5.6x — unrepresentative of the eval's
    # real workload, which runs on trained features)
    rng = np.random.default_rng(SEED)
    centers = rng.normal(size=(L, D)) * 3.0
    lab = rng.integers(0, L, N)
    x = centers[lab] + 0.35 * rng.normal(size=(N, D))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32), lab


def stage_plan():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 16)
    import jax.numpy as jnp

    from graphlearninglayer_tpu.ops.bsr import chain_rank, kmeans
    from graphlearninglayer_tpu.parallel import make_mesh
    from graphlearninglayer_tpu.parallel.edge_shard import (
        build_edge_shard_plan, edge_sharded_solve, sharded_knn)

    x, lab = _features()
    k_lab = 250
    y_full = np.zeros((N, L), np.float32)
    y_full[np.arange(k_lab), lab[:k_lab]] = 1.0

    # shared cluster permutation, similarity-chained cluster ids (what
    # edge_sharded_transductive_laplace does once per eval)
    labels_d, cent_d = kmeans(jnp.asarray(x), 128)
    key = np.asarray(chain_rank(cent_d))[np.asarray(labels_d)]
    perm = np.argsort(key, kind="stable")
    x_p = x[perm]
    inv = np.empty(N, np.int64)
    inv[perm] = np.arange(N)
    yp = np.zeros((N, L), np.float32)
    yp[inv[:k_lab]] = y_full[:k_lab]

    out = {"n": N, "k": K, "l": L, "k_lab": k_lab}
    for nd in (8, 16):
        mesh = make_mesh(nd, axes=("graph",))
        t0 = time.time()
        nbr, dist2 = sharded_knn(mesh, jnp.asarray(x_p), K)
        nbr = np.asarray(jax.device_get(nbr))
        dist2 = np.asarray(jax.device_get(dist2))
        t_knn = time.time() - t0
        t0 = time.time()
        plan = build_edge_shard_plan(nbr, dist2, yp, inv[:k_lab], nd,
                                     tau=1e-8)
        t_plan = time.time() - t0
        t0 = time.time()
        _, iters, err = edge_sharded_solve(mesh, plan)
        iters = int(np.asarray(iters))
        t_solve = time.time() - t0
        s = dict(plan.stats)
        qp = np.asarray(s.pop("halo_rows_qp"))
        # exact cross-host bytes per iteration under a contiguous
        # device->host split (first nd/2 shards = host 0): the ring
        # exchange ships, per device and offset o, cap_o rows to
        # (p - o) mod nd and receives cap_o from (p + o) mod nd
        half = nd // 2
        host_of = lambda p: p // half
        itemsize = 4
        cross = 0
        for o, cap in s["ring_caps"].items():
            o = int(o)
            for p in range(half):            # host 0's devices
                if host_of((p - o) % nd) != 0:
                    cross += cap             # send crossing out
                if host_of((p + o) % nd) != 0:
                    cross += cap             # receive crossing in
        s["cross_bytes_per_host_iter"] = int(cross * L * itemsize)
        # per-device send+receive total (the ICI-side bound)
        halo_total = sum(int(c) for c in s["ring_caps"].values())
        s["intra_bytes_per_device_iter"] = int(
            2 * halo_total * L * itemsize)
        s["real_halo_rows_mean_pair"] = float(qp[~np.eye(nd, dtype=bool)]
                                              .mean())
        s["halo_rows_qp"] = qp.tolist()   # per-(q,p) demand, for tiering
        s.update(iters=iters, err=float(np.asarray(err)),
                 t_knn_cpu=t_knn, t_plan_host=t_plan, t_solve_cpu=t_solve)
        out[f"nd{nd}"] = s
        os.makedirs(OUT_DIR, exist_ok=True)
        # shard-0 plan arrays for the TPU compute stage: the REAL edge
        # lists carry the cluster permutation's locality (a uniform-random
        # src probe is pessimistic about the gather's cache behavior)
        np.savez(os.path.join(OUT_DIR, f"plan_arrays{_SUF}_nd{nd}.npz"),
                 edge_dst=plan.edge_dst[0], edge_src=plan.edge_src[0],
                 edge_val=plan.edge_val[0])
        print(f"nd={nd}: e_cap={s['e_cap']} n_ext={s['n_ext']} "
              f"ring_caps={s['ring_caps']} iters={iters} "
              f"a2a={s['a2a_bytes_per_device']/1e6:.2f} MB/dev/iter "
              f"cross={s['cross_bytes_per_host_iter']/1e6:.2f} MB/host/iter "
              f"(plan {t_plan:.2f}s, cpu solve {t_solve:.2f}s)")
    os.makedirs(OUT_DIR, exist_ok=True)
    with open(os.path.join(OUT_DIR, f"plan{_SUF}.json"), "w") as f:
        json.dump(out, f, indent=1)


def stage_compute():
    """Time the per-device local matvec on the real chip at the plan's
    shapes: the flat sorted-edge segment-sum of _edge_solve_impl's spmm
    (gather (l, E) of the extended iterate + sorted scatter-add into
    local rows), minus the all_to_all.

    Relay rules (CLAUDE.md): inputs are generated ON DEVICE with salted
    keys (host-built arrays would stream through the ~55 MB/s wire inside
    the timed loop) and each timed call sees a never-seen iterate."""
    import jax
    import jax.numpy as jnp

    with open(os.path.join(OUT_DIR, f"plan{_SUF}.json")) as f:
        plan = json.load(f)

    results = {}
    for key in ("nd8", "nd16"):
        s = plan[key]
        n_loc, e_cap, nd = s["n_loc"], s["e_cap"], s["nd"]
        n_ext = s["n_ext"]
        # the REAL shard-0 edge lists from the plan stage (locality intact;
        # the one-time ~10 MB wire transfer sits outside the timed loop)
        arrs = np.load(os.path.join(OUT_DIR,
                                    f"plan_arrays{_SUF}_nd{s['nd']}.npz"))
        edge_dst = jnp.asarray(arrs["edge_dst"])
        edge_src = jnp.asarray(arrs["edge_src"])
        edge_val = jnp.asarray(arrs["edge_val"].astype(np.float32))

        CHAIN = 50   # in-jit matvec chain: amortizes the per-dispatch
                     # relay floor (~3-40 ms) that a one-matvec-per-call
                     # probe measures instead of device time (CLAUDE.md:
                     # trust long-iteration averages only)

        @jax.jit
        def matvec_chain(xa):
            def body(_, v):
                xt = v.T
                contrib = edge_val[None] * jnp.take(xt, edge_src, axis=1)
                out_t = jnp.zeros((L, n_loc + 1), xt.dtype).at[
                    :, edge_dst].add(contrib, indices_are_sorted=True)
                # re-extend so the loop carry keeps the (n_ext, L) shape
                return jnp.concatenate(
                    [out_t[:, :n_loc].T, v[n_loc:] * 0.999], axis=0)

            return jax.lax.fori_loop(0, CHAIN, body, xa)

        @jax.jit
        def gen(seed):
            return jax.random.uniform(jax.random.PRNGKey(seed),
                                      (n_ext, L), jnp.float32)

        np.asarray(matvec_chain(gen(0))[:1])       # compile
        calls = 4
        seed0 = int(time.time_ns() % 2**31)
        xs = [jax.block_until_ready(gen(seed0 + i)) for i in range(calls)]
        t0 = time.time()
        outs = [matvec_chain(xv) for xv in xs]
        for o in outs:
            np.asarray(o[:1])
        dt = (time.time() - t0) / (calls * CHAIN)
        results[key] = dict(t_local_matvec=dt, n_loc=n_loc, e_cap=e_cap,
                            n_ext=n_ext)
        print(f"{key}: local matvec {dt*1e3:.3f} ms "
              f"({e_cap} edges, {n_ext} ext rows)")
    with open(os.path.join(OUT_DIR, f"compute{_SUF}.json"), "w") as f:
        json.dump(results, f, indent=1)


def stage_model():
    with open(os.path.join(OUT_DIR, f"plan{_SUF}.json")) as f:
        plan = json.load(f)
    with open(os.path.join(OUT_DIR, f"compute{_SUF}.json")) as f:
        comp = json.load(f)

    e_total = 2 * plan["n"] * plan["k"]      # directed edges both halves
    iters = plan["nd8"]["iters"]
    rows = []
    for bw_ici in (4.5e10, 9e10, 1.8e11):    # bytes/s per device over ICI
        for bw_dcn in (6.25e9, 12.5e9, 2.5e10, 5e10):  # bytes/s per host
            t1 = (comp["nd8"]["t_local_matvec"]
                  + plan["nd8"]["a2a_bytes_per_device"] / bw_ici)
            t2_comm = max(
                plan["nd16"]["intra_bytes_per_device_iter"] / bw_ici,
                plan["nd16"]["cross_bytes_per_host_iter"] / bw_dcn)
            t2 = comp["nd16"]["t_local_matvec"] + t2_comm
            eff = t1 / (2 * t2)
            rows.append((bw_ici, bw_dcn, t1, t2, eff,
                         e_total / t1, e_total / t2))
    print(f"{'ICI B/s':>9} {'DCN B/s':>9} {'t1h/iter':>9} {'t2h/iter':>9} "
          f"{'eff':>6} {'edges/s 1h':>11} {'edges/s 2h':>11}")
    for r in rows:
        print(f"{r[0]:9.1e} {r[1]:9.1e} {r[2]*1e3:7.2f}ms {r[3]*1e3:7.2f}ms "
              f"{r[4]*100:5.1f}% {r[5]:11.3e} {r[6]:11.3e}")
    out = dict(iters=iters, e_total=e_total,
               rows=[dict(bw_ici=a, bw_dcn=b, t1=c, t2=d, eff=e,
                          edges_s_1h=f_, edges_s_2h=g)
                     for a, b, c, d, e, f_, g in rows])
    with open(os.path.join(OUT_DIR, f"model{_SUF}.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    {"plan": stage_plan, "compute": stage_compute,
     "model": stage_model}[sys.argv[1]]()
