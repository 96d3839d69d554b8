"""SupCon/SimCLR pretraining driver: host two-crop path and the
device-resident (--device_data) two-view path both run and learn."""
import flax.linen as nn
import jax.numpy as jnp
import numpy as np
import pytest

from graphlearninglayer_tpu.config.cli import parse_option
from graphlearninglayer_tpu.models import l2_normalize
from graphlearninglayer_tpu.models import buildnet as bn
from graphlearninglayer_tpu.train import supcon


class TinyEncoder(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.relu(nn.Conv(8, (3, 3), strides=2, padding=1)(x))
        x = jnp.mean(x, axis=(1, 2))
        return l2_normalize(nn.Dense(16)(x))


@pytest.fixture()
def tiny_opt(tmp_path, monkeypatch):
    monkeypatch.setitem(bn.model_dict, "tinycnn",
                        (lambda dtype=jnp.float32: TinyEncoder(), 16))
    monkeypatch.chdir(tmp_path)
    return ["--dataset", "synthetic", "--model", "tinycnn",
            "--epochs", "3", "--batch_size", "32", "--synth_n_train", "96",
            "--synth_n_test", "32", "--num_workers", "0",
            "--sup_method", "SupCon", "--augment_type_ss", "weak"]


def test_supcon_host_path_learns(tiny_opt):
    rec = supcon.run_supcon(parse_option(tiny_opt))
    assert len(rec["loss"]) == 3
    assert all(np.isfinite(v) for v in rec["loss"])
    assert rec["loss"][-1] < rec["loss"][0]


def test_supcon_device_data_learns(tiny_opt):
    rec = supcon.run_supcon(parse_option(tiny_opt + ["--device_data"]))
    assert len(rec["loss"]) == 3
    assert all(np.isfinite(v) for v in rec["loss"])
    assert rec["loss"][-1] < rec["loss"][0]


def test_simclr_device_data_runs(tiny_opt):
    rec = supcon.run_supcon(parse_option(tiny_opt + ["--device_data",
                                                     "--epochs", "1"]),
                            simclr=True)
    assert len(rec["loss"]) == 1 and np.isfinite(rec["loss"][0])
