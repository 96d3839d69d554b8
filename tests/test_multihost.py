"""Execute the multi-host init path for real: two OS processes, localhost
coordinator over the jax.distributed coordination service (the DCN stand-in),
a cross-process ('data', 'graph') mesh, and one global psum riding the Gloo
CPU collectives.

This is the only way to cover parallel/multihost.py honestly — in-process
tests cannot exercise jax.distributed.initialize (SURVEY §2.3 DCN plan;
the reference has no multi-host story at all).
"""
import os
import socket
import subprocess
import sys

import pytest

_CHILD = os.path.join(os.path.dirname(__file__), "multihost_child.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_init_and_psum():
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    # fresh interpreters must boot on CPU, NOT grab the (single-process)
    # TPU plugin; extend PYTHONPATH, never overwrite (CLAUDE.md)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (env.get("PYTHONPATH", ""), _REPO) if p)
    procs = [subprocess.Popen(
        [sys.executable, _CHILD, str(pid), "2", coord],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"MULTIHOST_OK pid={pid} psum=6.0" in out, out


@pytest.mark.parametrize("mode", ["", "dd", "ddshard"])
def test_two_process_fullysup_driver(tmp_path, mode):
    """The PRODUCTION driver across two OS processes: fullysup --mesh auto
    trains one epoch on a 4-device mesh spanning both processes (global
    batch arrays over the coordination service, replicated state, primary
    -only checkpointing).  mode 'dd' adds --device_data (globally
    replicated resident dataset, index-only per-step traffic); 'ddshard'
    additionally forces the transductive eval through the edge-partitioned
    solver on the global mesh (resident global encode + sharded KNN +
    halo-exchange CG — the multi-process production eval, no single-host
    fallback).  Identical seeds -> both processes must report the SAME
    loss and eval accuracy."""
    coord = f"localhost:{_free_port()}"
    child = os.path.join(os.path.dirname(__file__),
                         "multihost_driver_child.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (env.get("PYTHONPATH", ""), _REPO) if p)
    procs = []
    for pid in range(2):
        wd = tmp_path / f"proc{pid}"
        wd.mkdir()
        procs.append(subprocess.Popen(
            [sys.executable, child, str(pid), "2", coord, str(wd), mode],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    lines = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
        ok = [ln for ln in out.splitlines()
              if ln.startswith("MULTIHOST_DRIVER_OK")]
        assert ok, out[-4000:]
        lines.append(ok[0].split(" ", 1)[1])
    # same seed, same global batches -> identical numerics on both ranks
    assert lines[0].split("loss=")[1] == lines[1].split("loss=")[1], lines


def test_initialize_multihost_noop_without_coordinator(monkeypatch):
    """Single-process runs (no coordinator anywhere) must be a clean no-op
    returning False — the drivers call this unconditionally."""
    from graphlearninglayer_tpu.parallel.multihost import initialize_multihost

    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    assert initialize_multihost() is False
