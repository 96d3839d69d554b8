"""Supervised-contrastive / SimCLR encoder pretraining.

The reference ecosystem trains GLL heads on top of SupCon/SimCLR-pretrained
encoders (its shipped CIFAR-10 checkpoint is SimCLR-pretrained,
README.md:31-32; ``--sup_method SupCon``, losses.py:11-98, and the
N-crop loader machinery utils.py:27-45, 379-502 exist for this).  This
driver provides that capability natively: multi-view batches through the
BuildNet encoder+head, SupCon loss on the normalized features (labels for
SupCon mode, no labels for SimCLR mode).

Run: python -m graphlearninglayer_tpu.train.supcon --dataset synthetic \
        --batch_size 128 --epochs 2 --sup_method SupCon
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config.cli import parse_option
from ..data import Transform, TwoCropBatchLoader, load_dataset
from ..models import BuildNet
from ..utils.checkpoint import save_checkpoint
from .losses import sup_con_loss
from .optim import make_lr_schedule, make_optimizer
from .trainer import (TrainState, _apply, _device_normalize,
                      create_train_state)

__all__ = ["run_supcon", "main"]


def run_supcon(opt, simclr: bool = False) -> dict:
    from ..data.datasets import synth_kwargs_from_opt
    spec = load_dataset(opt.dataset, allow_synthetic_fallback=True,
                    **synth_kwargs_from_opt(opt))
    tf = Transform(spec.name if spec.name in
                   ("mnist", "fashion_mnist", "cifar10", "cifar100",
                    "miniimagenet", "synthetic") else "synthetic",
                   opt.augment_type_ss if opt.augment_type_ss != "no"
                   else "weak")
    # --device_data: the uint8 training set lives on device; each step
    # ships one index vector and draws BOTH views by running the on-device
    # transform (data/device_aug.py) twice with independent subkeys —
    # same two-view semantics as TwoCropBatchLoader, device-side
    device_data = bool(getattr(opt, "device_data", False))
    steps_per_epoch = len(spec.train_labels) // opt.batch_size
    loader = None if device_data else TwoCropBatchLoader(
        spec.train_images, spec.train_labels, opt.batch_size, tf,
        seed=opt.seed, workers=opt.num_workers, n_views=2, emit="uint8",
        to_device=True)
    model = BuildNet(name=opt.model, head=opt.head_type,
                     feat_dim=opt.embedding_dim,
                     num_classes=spec.num_classes,
                     dtype=jnp.bfloat16 if getattr(opt, "bf16", False)
                     else jnp.float32)
    schedule = make_lr_schedule(opt.learning_rate, opt.epochs,
                                steps_per_epoch, cosine=opt.cosine,
                                lr_decay_rate=opt.lr_decay_rate,
                                lr_decay_epochs=opt.lr_decay_epochs,
                                warm=opt.warm)
    tx = make_optimizer(schedule, adam=opt.Adam, momentum=opt.momentum,
                        weight_decay=opt.weight_decay)
    state = create_train_state(model, tx, jax.random.PRNGKey(opt.seed),
                               jnp.zeros((1, *spec.image_shape), jnp.float32))

    norm = (tf.mean, tf.std)

    def _supcon_update(state, flat_views, labels, rng, bsz, n_views):
        def loss_fn(params):
            (_, feats), new_stats = _apply(model, params, state.batch_stats,
                                           flat_views, train=True, rng=rng)
            feats = feats.reshape(bsz, n_views, -1)
            loss = sup_con_loss(feats, None if simclr else labels,
                                temperature=opt.temp)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, new_stats, opt_state,
                          state.step + 1), loss

    @jax.jit
    def step(state: TrainState, views, labels, rng):
        bsz, n_views = views.shape[:2]
        flat = _device_normalize(
            views.reshape(bsz * n_views, *views.shape[2:]), norm)
        return _supcon_update(state, flat, labels, rng, bsz, n_views)

    if device_data:
        from ..data.device_aug import DeviceTransform

        dev_aug = DeviceTransform(tf.dataset, tf.mode)
        h, w, c = spec.image_shape
        data_dev = jax.device_put(np.ascontiguousarray(
            spec.train_images.reshape(len(spec.train_labels), -1)))
        rng_order = np.random.default_rng(opt.seed * 7919 + 5)

        @jax.jit
        def dd_step(state: TrainState, data, idx, labels, rng):
            images = jnp.take(data, idx, axis=0).reshape(-1, h, w, c)
            rng, k1, k2 = jax.random.split(rng, 3)
            # two independent augmented views of the same rows, stacked
            # view-major so flat rows pair up exactly like the host
            # TwoCropBatchLoader's (B, 2, ...) layout
            flat_u8 = jnp.concatenate([dev_aug(images, k1),
                                       dev_aug(images, k2)])
            flat = _device_normalize(flat_u8, norm)
            bsz = idx.shape[0]
            flat = flat.reshape(2, bsz, h, w, c).transpose(1, 0, 2, 3, 4) \
                       .reshape(2 * bsz, h, w, c)
            return _supcon_update(state, flat, labels, rng, bsz, 2)

    records = {"loss": []}
    for epoch in range(1, opt.epochs + 1):
        t0 = time.time()
        losses = []
        if device_data:
            order = rng_order.permutation(len(spec.train_labels))
            stream = ((order[i * opt.batch_size:(i + 1) * opt.batch_size],
                       None,
                       spec.train_labels[order[i * opt.batch_size:
                                               (i + 1) * opt.batch_size]])
                      for i in range(steps_per_epoch))
        else:
            stream = loader
        for i, (idx, views, labels) in enumerate(stream):
            key = jax.random.PRNGKey(opt.seed + epoch * 10000 + i)
            if device_data:
                state, loss = dd_step(state, data_dev, jnp.asarray(idx),
                                      jnp.asarray(labels), key)
            else:
                state, loss = step(state, jnp.asarray(views),
                                   jnp.asarray(labels), key)
            # device future; a per-step float() would serialize on the
            # relay round trip
            losses.append(loss)
        records["loss"].append(float(np.mean(np.asarray(jnp.stack(losses)))))
        print(f"supcon epoch {epoch}: loss {records['loss'][-1]:.4f} "
              f"({time.time() - t0:.1f}s)")
    save_checkpoint(os.path.join(opt.save_folder, "supcon"), state,
                    opt.epochs)
    return records


def main(argv=None):
    opt = parse_option(argv)
    return run_supcon(opt, simclr=(opt.sup_method != "SupCon"))


if __name__ == "__main__":
    main()
