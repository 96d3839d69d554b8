"""Driver-level test of the adversarial training loop (reference
train_and_adversarial.py:888-986 equivalent).

The attack/perturbation functions have their own unit tests
(tests/test_attacks.py); this exercises run() itself — per-dataset config
dispatch, device-resident data path, deferred loss/pred syncs, per-epoch
eval, and checkpoint save — on a tiny synthetic config so it stays fast on
the CPU test mesh.
"""
import numpy as np
import pytest

from graphlearninglayer_tpu.train import adversarial_driver as ad


@pytest.fixture()
def tiny_cfg(monkeypatch, tmp_path):
    cfg = ad.AdvConfig("synthetic", "smallcnn_gl", "smallcnn", -1.0, 1.0,
                       0.1, 32, 2, 0.01, 2, adam=True, gl_tau=1e-6,
                       pgd_iters=2)
    monkeypatch.setitem(ad.DATASET_CONFIGS, "synthetic", cfg)

    import graphlearninglayer_tpu.train.adversarial_driver as mod

    orig = mod.load_dataset

    def small_load(name, **kw):
        kw.update(n_train=128, n_test=64)
        return orig(name, **kw)

    monkeypatch.setattr(mod, "load_dataset", small_load)
    return tmp_path


def test_natural_gl_training_learns(tiny_cfg):
    res = ad.run("gl", "natural", "synthetic", save_dir=str(tiny_cfg))
    assert np.isfinite(res["gl_acc"])
    assert res["gl_acc"] > 0.4  # well above 10-class chance (0.1)
    assert (tiny_cfg / "synthetic_gl_natural").is_dir()


def test_robust_mlp_training_runs(tiny_cfg):
    res = ad.run("mlp", "robust", "synthetic", epochs=1,
                 save_dir=str(tiny_cfg))
    assert np.isfinite(res["mlp_acc"])
    assert 0.0 <= res["mlp_acc"] <= 1.0


def test_eval_runs_when_test_set_smaller_than_batch(tiny_cfg, monkeypatch):
    """A test split smaller than the training batch must still be
    evaluated (the eval batch caps at the split size); previously
    `usable` rounded down to zero and the eval silently reported 0.0."""
    cfg = ad.DATASET_CONFIGS["synthetic"]
    monkeypatch.setitem(
        ad.DATASET_CONFIGS, "synthetic",
        ad.AdvConfig(**{**cfg.__dict__, "batch_size": 100}))  # > n_test=64
    res = ad.run("gl", "natural", "synthetic", save_dir=str(tiny_cfg))
    assert np.isfinite(res["gl_acc"])
    assert res["gl_acc"] > 0.0
