"""Child process for the 2-process fullysup driver test: boots on 2 local
CPU devices, joins the jax.distributed coordination service, and runs ONE
epoch of the production driver with --mesh auto — the train step executes
over a 4-device mesh spanning both OS processes (global batch arrays,
Gloo cross-process collectives)."""
import os
import sys

pid, nproc, coord, workdir = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], sys.argv[4])
mode = sys.argv[5] if len(sys.argv) > 5 else ""   # "" | "dd" (--device_data)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

os.environ["JAX_COORDINATOR_ADDRESS"] = coord
os.environ["JAX_NUM_PROCESSES"] = str(nproc)
os.environ["JAX_PROCESS_ID"] = str(pid)
os.chdir(workdir)

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from graphlearninglayer_tpu.models import buildnet as bn, l2_normalize


class TinyEncoder(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.relu(nn.Conv(8, (3, 3), strides=2, padding=1)(x))
        x = jnp.mean(x, axis=(1, 2))
        return l2_normalize(nn.Dense(16)(x))


bn.model_dict["tinycnn"] = (lambda dtype=jnp.float32: TinyEncoder(), 16)

from graphlearninglayer_tpu.config.cli import parse_option
from graphlearninglayer_tpu.train import fullysup

argv = [
    "--sup_train_type", "gl", "--dataset", "synthetic", "--model", "tinycnn",
    "--epochs", "1", "--batch_size", "32", "--num_train", "10",
    "--knn_k", "6", "--synth_n_train", "64", "--synth_n_test", "32",
    "--num_workers", "0", "--plot_freq_ss", "100", "--epsilon", "auto",
    "--mesh", "auto", "--grad_warn", "0"]
if mode in ("dd", "ddshard"):
    # the device-resident production configuration across processes: the
    # dataset becomes a GLOBAL replicated array, per-step traffic is
    # index/label vectors, gather+augment+step run in one sharded jit
    argv += ["--device_data", "--augment_type_sup", "weak"]
if mode == "ddshard":
    # force the transductive eval through the edge-partitioned solver on
    # the GLOBAL 4-device mesh (the multi-process production eval path:
    # resident global encode + sharded KNN + halo-exchange CG)
    argv += ["--shard_eval_min_n", "1"]

import io

buf = io.StringIO()


class _Tee:
    def __init__(self, *streams):
        self.streams = streams

    def write(self, s):
        for t in self.streams:
            t.write(s)

    def flush(self):
        for t in self.streams:
            t.flush()


sys.stdout = _Tee(sys.__stdout__, buf)
opt = parse_option(argv)
records = fullysup.run_training(opt)
sys.stdout = sys.__stdout__
assert jax.process_count() == nproc, jax.process_count()
assert all(np.isfinite(v) for v in records["loss"]), records
assert all(np.isfinite(v) for v in records["test_acc"]), records
if mode == "ddshard":
    # the eval must actually have used the edge-sharded route
    assert "edge-sharded over 4 devices" in buf.getvalue(), \
        buf.getvalue()[-2000:]
print(f"MULTIHOST_DRIVER_OK pid={pid} loss={records['loss'][0]:.6f} "
      f"acc={records['test_acc'][-1]:.4f}", flush=True)
