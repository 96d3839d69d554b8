"""Two consecutive multi-process edge-sharded evals must reuse the
cross-eval cache (shard_perm + CG warm start) and stay numerically equal
to the single-device solve.

Permanent, CI-sized version of the round-5 60k artifact run
(benchmarks/multihost_60k.py / benchmarks/multihost_60k/summary.json):
the parent computes single-device references, two OS processes x 4 CPU
devices under jax.distributed solve the same graphs through
parallel/edge_shard.py, and each child asserts equality, the reused
permutation OBJECT, and the warm-start iteration drop.
"""
import os
import subprocess
import sys

_SCRIPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks", "multihost_60k.py")


def test_two_process_eval_cache_reuse(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GLL_MH60K_OUT"] = str(tmp_path)   # don't clobber the archived
    # 60k summary under benchmarks/multihost_60k/
    out = subprocess.run(
        [sys.executable, _SCRIPT, "8192", "25"],
        env=env, capture_output=True, text=True, timeout=900,
        cwd=tmp_path)
    assert out.returncode == 0, out.stdout[-4000:] + out.stderr[-2000:]
    assert out.stdout.count("MULTIHOST60K_OK") == 2, out.stdout[-4000:]
