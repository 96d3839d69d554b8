"""Production multi-device path: the fullysup driver with --mesh must (a)
reproduce the single-device numerics and (b) actually route the large-n
transductive eval through the edge-partitioned multi-device solver."""
import flax.linen as nn
import jax.numpy as jnp
import numpy as np
import pytest

import graphlearninglayer_tpu.parallel.edge_shard as es_mod
from graphlearninglayer_tpu.config.cli import parse_option
from graphlearninglayer_tpu.models import l2_normalize
from graphlearninglayer_tpu.models import buildnet as bn
from graphlearninglayer_tpu.train import fullysup


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
    return ["--sup_train_type", "gl", "--dataset", "synthetic",
            "--model", "tinycnn", "--epochs", "2", "--batch_size", "32",
            "--num_train", "10", "--knn_k", "6", "--synth_n_train", "96",
            "--synth_n_test", "32", "--num_workers", "0",
            "--plot_freq_ss", "100", "--epsilon", "auto"]


def test_fullysup_mesh_matches_single_device(tiny_opt):
    """Same seed, same data: the 8-device sharded driver run must reproduce
    the single-device loss/accuracy trajectory (GSPMD sharding is a layout,
    not a numerics change — BN reductions and gradient psums are global)."""
    rec_off = fullysup.run_training(parse_option(tiny_opt + ["--mesh", "off"]))
    rec_on = fullysup.run_training(parse_option(tiny_opt + ["--mesh", "8"]))
    np.testing.assert_allclose(rec_on["loss"], rec_off["loss"],
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(rec_on["train_acc"], rec_off["train_acc"],
                               atol=1e-6)
    # eval stays single-device here (n < shard_eval_min_n default): same
    # features -> same transductive accuracy up to solver roundoff
    assert np.max(np.abs(np.asarray(rec_on["test_acc"])
                         - np.asarray(rec_off["test_acc"]))) <= 100.0 / 32


def test_fullysup_mesh_routes_eval_through_edge_shard(tiny_opt, monkeypatch):
    calls = []
    orig = es_mod.edge_sharded_transductive_laplace

    def spy(*a, **kw):
        calls.append(kw.get("knn_num"))
        return orig(*a, **kw)

    monkeypatch.setattr(es_mod, "edge_sharded_transductive_laplace", spy)
    rec = fullysup.run_training(parse_option(
        tiny_opt + ["--mesh", "8", "--shard_eval_min_n", "1",
                    "--grad_warn", "0"]))
    # epoch-0 eval + final eval both routed through the sharded solver
    assert len(calls) >= 2
    assert all(np.isfinite(a) for a in rec["test_acc"])


def test_fullysup_mesh_device_data_routes_eval_through_edge_shard(
        tiny_opt, monkeypatch):
    """--device_data + --mesh + low --shard_eval_min_n: the RESIDENT eval
    encode must feed the edge-partitioned solver (the production combo the
    round-3 advisor flagged as uncovered: mesh-committed features entering
    edge_sharded_transductive_laplace on the eval mesh)."""
    calls = []
    orig = es_mod.edge_sharded_transductive_laplace

    def spy(*a, **kw):
        calls.append(kw.get("knn_num"))
        return orig(*a, **kw)

    monkeypatch.setattr(es_mod, "edge_sharded_transductive_laplace", spy)
    rec = fullysup.run_training(parse_option(
        tiny_opt + ["--mesh", "8", "--shard_eval_min_n", "1",
                    "--device_data", "--augment_type_sup", "weak",
                    "--grad_warn", "0"]))
    assert len(calls) >= 2
    assert all(np.isfinite(a) for a in rec["test_acc"])


def test_fullysup_mesh_mlp_branch_runs(tiny_opt):
    argv = [a if a != "gl" else "mlp" for a in tiny_opt]
    rec = fullysup.run_training(parse_option(argv + ["--mesh", "8",
                                                     "--epochs", "1"]))
    assert len(rec["loss"]) == 1 and np.isfinite(rec["loss"][0])


def test_fullysup_mesh_auto_engages_on_virtual_mesh(tiny_opt, capfd):
    """--mesh auto (the default) must pick up all 8 visible devices."""
    fullysup.run_training(parse_option(tiny_opt + ["--epochs", "1"]))
    out = capfd.readouterr().out
    assert "mesh: 8 devices" in out


def test_fullysup_mesh_device_data_matches_single_device(tiny_opt):
    """--device_data + --mesh (the production configuration: device-resident
    uint8 dataset, in-jit augmentation, batch sharded over the mesh) must
    reproduce the single-device --device_data trajectory."""
    # low lr + no grad-warn noise: the synthetic tiny run explodes at the
    # default lr and chaos amplifies reduction-order roundoff across epochs
    argv = tiny_opt + ["--device_data", "--augment_type_sup", "weak",
                       "--learning_rate", "0.001", "--grad_warn", "0"]
    rec_off = fullysup.run_training(parse_option(argv + ["--mesh", "off"]))
    rec_on = fullysup.run_training(parse_option(argv + ["--mesh", "8"]))
    np.testing.assert_allclose(rec_on["loss"], rec_off["loss"],
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(rec_on["train_acc"], rec_off["train_acc"],
                               atol=1e-6)


def test_fullysup_mesh_device_data_mlp_branch_runs(tiny_opt):
    argv = [a if a != "gl" else "mlp" for a in tiny_opt]
    rec = fullysup.run_training(parse_option(
        argv + ["--device_data", "--mesh", "8", "--epochs", "1"]))
    assert len(rec["loss"]) == 1 and np.isfinite(rec["loss"][0])
