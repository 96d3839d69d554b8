"""MLP-vs-GL comparison driver.

Equivalent of reference ``compare_to_mlp.py`` (22-291): trains the MLP
classifier head while *also* evaluating the would-be GL loss on every batch
(compare_to_mlp.py:64-73) — dual loss meters and dual plots — i.e. a cheap
"evaluate the GLL head without training it" mode (the GL forward runs under
``stop_gradient``-free eval but its loss is not backpropagated).

Run: python -m graphlearninglayer_tpu.train.compare_to_mlp \
         --dataset synthetic --batch_size 128 --epochs 3
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config.cli import parse_option
from ..data import BatchLoader, ScoredDataset, Transform, load_dataset
from ..models import BuildNet
from ..ops import laplace_learning
from ..train.losses import custom_ce_loss
from .optim import make_lr_schedule, make_optimizer
from .trainer import _device_normalize, TrainState, _apply, create_train_state

__all__ = ["run_comparison", "main"]


def run_comparison(opt) -> dict:
    rng_np = np.random.default_rng(opt.seed)
    from ..data.datasets import synth_kwargs_from_opt
    spec = load_dataset(opt.dataset, allow_synthetic_fallback=True,
                    **synth_kwargs_from_opt(opt))
    num_classes = spec.num_classes
    tf = Transform(spec.name if spec.name in
                   ("mnist", "fashion_mnist", "cifar10", "cifar100",
                    "miniimagenet", "synthetic") else "synthetic",
                   "eval" if opt.augment_type_sup == "no"
                   else opt.augment_type_sup)

    ds = ScoredDataset(spec)
    loader = BatchLoader(spec.train_images, spec.train_labels,
                         opt.batch_size, tf, seed=opt.seed,
                         workers=opt.num_workers, emit="uint8",
                         to_device=True)
    model = BuildNet(name=opt.model, head=opt.head_type,
                     feat_dim=opt.embedding_dim, num_classes=num_classes,
                     softmax=not opt.no_softmax,
                     dtype=jnp.bfloat16 if getattr(opt, "bf16", False)
                     else jnp.float32)
    schedule = make_lr_schedule(opt.learning_rate, opt.epochs, len(loader),
                                cosine=opt.cosine,
                                lr_decay_rate=opt.lr_decay_rate,
                                lr_decay_epochs=opt.lr_decay_epochs)
    tx = make_optimizer(schedule, adam=opt.Adam, momentum=opt.momentum,
                        weight_decay=opt.weight_decay)
    state = create_train_state(model, tx, jax.random.PRNGKey(opt.seed),
                               jnp.zeros((1, *spec.image_shape), jnp.float32))

    base_imgs, base_labels = ds.select_base(opt.num_train, "random", rng_np)
    eval_tf = Transform(tf.dataset, "eval")
    base_x = jnp.asarray(eval_tf.normalize(base_imgs))
    base_y = jnp.asarray(base_labels)

    norm = (tf.mean, tf.std)

    @jax.jit
    def step(state: TrainState, images, labels, rng):
        images = _device_normalize(images, norm)

        def loss_fn(params):
            (pred, _), new_stats = _apply(model, params, state.batch_stats,
                                          images, train=True, rng=rng)
            return custom_ce_loss(pred, labels), new_stats

        (mlp_loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)

        # GL loss evaluated on the SAME batch, not trained
        # (compare_to_mlp.py:64-73)
        x = jnp.concatenate([base_x, images], axis=0)
        (_, feats), _ = _apply(model, state.params, state.batch_stats, x,
                               train=False)
        gl_pred = laplace_learning(
            feats, jax.nn.one_hot(base_y, num_classes, dtype=feats.dtype),
            tau=opt.temp, epsilon=opt.epsilon, k=opt.knn_k)
        gl_loss = custom_ce_loss(gl_pred, labels)
        return (TrainState(params, new_stats, opt_state, state.step + 1),
                mlp_loss, gl_loss)

    records = {"mlp_loss": [], "gl_loss": []}
    for epoch in range(1, opt.epochs + 1):
        t0 = time.time()
        mlp_m, gl_m = [], []
        for i, (idx, images, labels) in enumerate(loader):
            state, mlp_loss, gl_loss = step(
                state, jnp.asarray(images), jnp.asarray(labels),
                jax.random.PRNGKey(opt.seed + epoch * 10000 + i))
            # keep device futures; syncing per step would serialize on the
            # device->host round trip (benchmarks/probe_step_overhead.py)
            mlp_m.append(mlp_loss)
            gl_m.append(gl_loss)
        # ONE stacked fetch per epoch (a float() per scalar costs a relay
        # round trip each)
        records["mlp_loss"].append(float(np.mean(np.asarray(jnp.stack(mlp_m)))))
        records["gl_loss"].append(float(np.mean(np.asarray(jnp.stack(gl_m)))))
        print(f"epoch {epoch}: mlp loss {records['mlp_loss'][-1]:.4f}  "
              f"gl loss {records['gl_loss'][-1]:.4f}  "
              f"({time.time() - t0:.1f}s)")

    np.save(os.path.join(opt.save_folder, "compare_records.npy"), records,
            allow_pickle=True)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.figure()
        plt.plot(records["mlp_loss"], label="mlp")
        plt.plot(records["gl_loss"], label="gl")
        plt.legend()
        plt.xlabel("epoch")
        plt.ylabel("loss")
        plt.savefig(os.path.join(opt.save_folder, "compare_losses.png"))
        plt.close()
    except Exception as e:
        print(f"plotting skipped: {e}")
    return records


def main(argv=None):
    opt = parse_option(argv)
    return run_comparison(opt)


if __name__ == "__main__":
    main()
