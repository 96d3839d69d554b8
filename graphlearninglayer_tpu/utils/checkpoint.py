"""Orbax checkpointing with tolerant restore.

Equivalent of reference save_model / set_model load (utils.py:126-134,
505-553): saves {params, batch_stats, opt_state, step, epoch, opt-dict} and
restores tolerantly — missing keys keep their initialized values (the
reference's strict=False fallback), extra keys are ignored.
"""
from __future__ import annotations

import os
import shutil
from typing import Any

import jax
import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]


def _ckpt(path: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(os.path.abspath(path))


def save_checkpoint(path: str, state, epoch: int, extra: dict | None = None):
    """Write state at ``epoch`` under ``path`` (a directory).

    Multi-process runs: EVERY process must call this (orbax coordinates
    its writes with cross-process barriers — a primary-only call hangs
    the others at the shutdown barrier).  Params/opt state are replicated
    (the mesh shards only batches/graph nodes), so each process pulls
    them to host numpy first and orbax's primary does the actual write;
    the overwrite rename-aside below touches the shared directory from
    the primary only.
    """
    multiproc = jax.process_count() > 1
    primary = jax.process_index() == 0
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if multiproc:
        import numpy as _np

        payload = jax.tree_util.tree_map(
            lambda a: _np.asarray(a.addressable_data(0))
            if isinstance(a, jax.Array) else a, payload)
    if extra:
        payload["extra"] = extra
    # Re-saving an epoch must overwrite: force=True alone is not enough
    # (orbax raises StepAlreadyExistsError even with force when the step
    # directory survives from an earlier run of the same save_folder — run
    # dirs are deterministically named from hyperparams, so re-runs hit this
    # on their first checkpoint).  Rename the old step dir aside instead of
    # deleting it so a crash mid-save cannot lose the previous checkpoint
    # (the reference's torch.save overwrite is atomic-rename-based); the
    # aside copy is removed only after the new save completes.
    step_dir = os.path.join(os.path.abspath(path), str(epoch))
    aside = step_dir + ".replaced"
    moved = False
    if primary and os.path.isdir(step_dir):
        if os.path.isdir(aside):
            shutil.rmtree(aside)
        os.rename(step_dir, aside)
        moved = True
    if multiproc:
        # every process must observe the post-rename filesystem before the
        # `epoch in mgr.all_steps()` check below: a process listing steps
        # BEFORE the primary's rename would call the collective mgr.delete
        # while the others skip it — mismatched collectives deadlock orbax
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(f"ckpt_rename_{path}_{epoch}")
    try:
        with _ckpt(path) as mgr:
            if epoch in mgr.all_steps():   # non-default step-dir layout
                mgr.delete(epoch)
            mgr.save(epoch, args=ocp.args.StandardSave(payload), force=True)
            mgr.wait_until_finished()
    except BaseException:
        if moved:
            # a failed mgr.save may leave a PARTIAL step dir behind; it
            # must not shadow the preserved copy — drop it, then restore
            if os.path.isdir(step_dir):
                shutil.rmtree(step_dir)
            os.rename(aside, step_dir)     # roll back to the old checkpoint
        raise
    if moved and os.path.isdir(aside):
        shutil.rmtree(aside)


def latest_step(path: str) -> int | None:
    if not os.path.isdir(path):
        return None
    with _ckpt(path) as mgr:
        return mgr.latest_step()


def restore_checkpoint(path: str, state, epoch: int | None = None):
    """Tolerant restore into ``state``; returns (state, restored_epoch).

    Missing subtrees in the checkpoint keep the values already in ``state``
    (mirrors the reference's `.module`-strip + strict=False fallback,
    utils.py:523-540).  A ``.pth``/``.pt`` FILE is a reference torch
    checkpoint and is converted in place (utils/torch_import.py) — so
    ``--cp_load_path resnet18_SimCLR_mlp.pth`` works here verbatim.
    """
    if os.path.isfile(path) and path.endswith((".pth", ".pt")):
        from .torch_import import restore_torch_checkpoint
        return restore_torch_checkpoint(path, state)
    with _ckpt(path) as mgr:
        step = epoch if epoch is not None else mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {path}")
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    new_state = state._replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    return new_state, step
