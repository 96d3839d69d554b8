"""Checkpoint save/restore semantics (reference utils.py:126-134,505-553).

Regression coverage for the cross-run overwrite case: the reference's
save_model freely overwrites an existing .pth; orbax instead raises
StepAlreadyExistsError when a step directory survives from a previous run
of the same (deterministically named) save_folder — save_checkpoint must
delete-then-save.
"""
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from graphlearninglayer_tpu.train.trainer import TrainState
from graphlearninglayer_tpu.utils.checkpoint import (
    latest_step, restore_checkpoint, save_checkpoint)


def _mk_state(seed):
    rng = np.random.default_rng(seed)
    params = {"w": jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32)),
              "b": jnp.asarray(rng.normal(size=(3,)).astype(np.float32))}
    tx = optax.sgd(0.1)
    return TrainState(params=params, batch_stats={},
                      opt_state=tx.init(params),
                      step=jnp.asarray(seed, jnp.int32))


def test_save_restore_roundtrip(tmp_path):
    path = str(tmp_path / "ckpt")
    s1 = _mk_state(1)
    save_checkpoint(path, s1, epoch=3)
    assert latest_step(path) == 3
    s2, ep = restore_checkpoint(path, _mk_state(2))
    assert ep == 3
    np.testing.assert_allclose(np.asarray(s2.params["w"]),
                               np.asarray(s1.params["w"]))
    assert int(s2.step) == 1


def test_resave_same_epoch_overwrites(tmp_path):
    """Same-epoch re-save (fresh manager = fresh run) must not raise and
    must keep the NEW payload."""
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, _mk_state(1), epoch=2)
    s_new = _mk_state(7)
    save_checkpoint(path, s_new, epoch=2)  # raised before the delete fix
    restored, ep = restore_checkpoint(path, _mk_state(3))
    assert ep == 2
    np.testing.assert_allclose(np.asarray(restored.params["w"]),
                               np.asarray(s_new.params["w"]))


def test_restore_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        restore_checkpoint(str(tmp_path / "nope"), _mk_state(0))


def test_resave_failure_rolls_back_previous_checkpoint(tmp_path, monkeypatch):
    """A crash mid-save of an existing epoch must not lose (or shadow) the
    previous checkpoint: the partial new step dir is removed and the aside
    copy restored."""
    import os

    import graphlearninglayer_tpu.utils.checkpoint as ckpt_mod

    path = str(tmp_path / "ck")
    s1 = _mk_state(1)
    save_checkpoint(path, s1, 5)

    class ExplodingManager:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def all_steps(self):
            return []

        def save(self, epoch, **kw):
            # leave a PARTIAL step dir behind, like a crash mid-write
            os.makedirs(os.path.join(path, str(epoch)), exist_ok=True)
            with open(os.path.join(path, str(epoch), "partial"), "w") as f:
                f.write("junk")
            raise RuntimeError("disk full")

    monkeypatch.setattr(ckpt_mod, "_ckpt", lambda p: ExplodingManager())
    with pytest.raises(RuntimeError):
        save_checkpoint(path, _mk_state(2), 5)
    monkeypatch.undo()

    # the original epoch-5 checkpoint is intact and restorable
    restored, epoch = restore_checkpoint(path, _mk_state(0))
    assert epoch == 5
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(s1.params["w"]))
    assert not os.path.isdir(os.path.join(path, "5.replaced"))
