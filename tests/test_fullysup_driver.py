"""Driver-level tests of run_training (reference FullySup.py semantics)."""
import flax.linen as nn
import jax.numpy as jnp
import numpy as np
import pytest

import graphlearninglayer_tpu.data as data_mod
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
    argv = ["--sup_train_type", "gl", "--dataset", "synthetic",
            "--model", "tinycnn", "--epochs", "2", "--batch_size", "32",
            "--num_train", "10", "--knn_k", "6", "--synth_n_train", "96",
            "--synth_n_test", "32", "--num_workers", "0",
            "--plot_freq_ss", "100", "--epsilon", "auto"]
    monkeypatch.chdir(tmp_path)  # save/ artifacts land in tmp
    return argv


def test_ds_stepsize_strides_only_initial_base_pool(tiny_opt, monkeypatch):
    """--ds_stepsize must stride ONLY the pool the initial base sample is
    drawn from (reference: DSCustomDataset wraps the no-transform dataset
    inside set_loader, utils.py:340-348) — the train loader, test set, and
    score-refresh pool stay full-size."""
    calls = []
    orig = data_mod.downsample_by_stride

    def recording(images, labels, stride):
        out = orig(images, labels, stride)
        calls.append((len(images), len(out[0]), stride))
        return out

    monkeypatch.setattr(data_mod, "downsample_by_stride", recording)
    opt = parse_option(tiny_opt + ["--ds_stepsize", "3"])
    records = fullysup.run_training(opt)
    # pool was strided exactly once, 96 -> 32 rows
    assert calls == [(96, 32, 3)]
    # the train loader ran on the FULL split: 96 // 32 = 3 steps/epoch,
    # visible as per-epoch loss averages over 3 batches (2 epochs recorded)
    assert len(records["loss"]) == 2
    assert all(np.isfinite(v) for v in records["loss"])


def test_device_data_gl_training_runs_without_host_batches(tiny_opt,
                                                           monkeypatch):
    """--device_data keeps the train set on device: the host loader's
    augmentation path must never run during training (only index/label
    vectors cross per step), and training still learns."""
    calls = []
    orig = data_mod.BatchLoader._augment_batch

    def recording(self, batch, rng=None):
        calls.append(len(batch))
        return orig(self, batch, rng)

    monkeypatch.setattr(data_mod.BatchLoader, "_augment_batch", recording)
    opt = parse_option(tiny_opt + ["--device_data", "--epochs", "3",
                                   "--augment_type_sup", "weak"])
    records = fullysup.run_training(opt)
    assert calls == []  # no host-side batch augmentation in device mode
    assert len(records["loss"]) == 3
    assert all(np.isfinite(v) for v in records["loss"])
    assert records["loss"][-1] < records["loss"][0]


def test_device_data_mlp_branch_runs(tiny_opt):
    opt = parse_option([a if a != "gl" else "mlp" for a in tiny_opt]
                       + ["--device_data"])
    records = fullysup.run_training(opt)
    assert len(records["loss"]) == 2
    assert all(np.isfinite(v) for v in records["loss"])


def test_run_training_without_stepsize_never_downsamples(tiny_opt,
                                                         monkeypatch):
    called = []
    monkeypatch.setattr(
        data_mod, "downsample_by_stride",
        lambda *a: called.append(a) or data_mod.downsample_by_stride)
    opt = parse_option(tiny_opt)
    records = fullysup.run_training(opt)
    assert not called
    assert len(records["loss"]) == 2


def test_per_interval_visualization_dirs(tiny_opt):
    """Reference FullySup.py:300-304 visualizes at EVERY plot interval into
    a ckpt_epoch_<N>/ directory; the final epoch's embedding lands in
    ckpt_epoch_<epochs>/ as well (FullySup.py:335-338)."""
    import os

    opt = parse_option(tiny_opt + ["--epochs", "2", "--plot_freq_ss", "1"])
    fullysup.run_training(opt)
    # every interval epoch, INCLUDING the final one, gets an embedding dir
    assert os.path.exists(os.path.join(opt.save_folder, "ckpt_epoch_1",
                                       "features_umap.png"))
    assert os.path.exists(os.path.join(opt.save_folder, "ckpt_epoch_2",
                                       "features_umap.png"))


def test_visualization_embeds_train_split_with_base_starred(tiny_opt,
                                                            monkeypatch):
    """The interval embedding covers the TRAIN split (subsampled to
    --viz_max_n) with the base rows appended and starred (reference
    visualize.py:96-139 loads the full train split; FullySup.py:300-304)."""
    import graphlearninglayer_tpu.evalx as evalx_mod

    seen = []

    def recording(features, labels, save_dir, base_mask=None, tsne=False,
                  **kw):
        seen.append((len(features), int(base_mask.sum()),
                     base_mask.argmax()))

    monkeypatch.setattr(evalx_mod, "visualize", recording)
    opt = parse_option(tiny_opt + ["--epochs", "1", "--plot_freq_ss", "1",
                                   "--viz_max_n", "40"])
    fullysup.run_training(opt)
    assert seen  # at least the final embedding ran
    for n_total, n_base, base_start in seen:
        assert n_base == 10            # --num_train base rows, starred
        assert n_total == 40 + 10      # subsampled train split + base
        assert base_start == 40        # base rows appended AFTER the split


def test_pre_pretrain_eval_when_sup_epochs(tiny_opt, monkeypatch):
    """With --sup_epochs > 0 the driver evaluates BEFORE the MLP-head
    pretrain as well (epoch -1, reference FullySup.py:229-243): the
    test_acc record gains one extra leading entry."""
    opt_plain = parse_option(tiny_opt + ["--epochs", "1"])
    rec_plain = fullysup.run_training(opt_plain)
    opt_pre = parse_option(tiny_opt + ["--epochs", "1",
                                       "--sup_epochs", "1"])
    rec_pre = fullysup.run_training(opt_pre)
    # plain: epoch-0 eval + final-epoch eval; pretrain adds the epoch -1 one
    assert len(rec_plain["test_acc"]) == 2
    assert len(rec_pre["test_acc"]) == 3
    assert all(np.isfinite(v) for v in rec_pre["test_acc"])


def test_resume_with_start_epochs(tiny_opt, capsys):
    """The verified resume workflow (reference cli.py:36-37,45-46):
    --cp_load_path warms the weights; --start_epochs N restarts the epoch
    loop at N+1.  A 1-epoch run checkpointed then resumed for epoch 2
    must run exactly one more epoch — and --cp_load_path WITHOUT
    --start_epochs must warn and restart at epoch 1."""
    import os

    opt1 = parse_option(tiny_opt[:])
    opt1.epochs = 1
    fullysup.run_training(opt1)
    ckpt = os.path.join(opt1.save_folder, "last")
    assert os.path.isdir(ckpt)

    # resume: --epochs counts ADDITIONAL epochs (cli.py:196 adds
    # start_epochs — reference FullySup.py:268 semantics); epochs=1 with
    # start_epochs=1 -> exactly ONE new epoch (the loop runs 2..2)
    opt2 = parse_option(tiny_opt + ["--cp_load_path", ckpt,
                                    "--start_epochs", "1",
                                    "--epochs", "1"])
    rec2 = fullysup.run_training(opt2)
    assert len(rec2["loss"]) == 1, rec2["loss"]
    assert all(np.isfinite(v) for v in rec2["loss"])
    out = capsys.readouterr().out
    assert "weights are warmed" not in out

    # warm-start-only (the checkpoint recipe): warns, restarts at epoch 1
    opt3 = parse_option(tiny_opt + ["--cp_load_path", ckpt])
    rec3 = fullysup.run_training(opt3)
    assert len(rec3["loss"]) == 2
    assert "weights are warmed" in capsys.readouterr().out
