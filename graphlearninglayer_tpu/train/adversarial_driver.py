"""Natural / PGD-robust training driver for GL and MLP classifiers.

Equivalent of reference ``train_and_adversarial.py`` (positional CLI:
``{gl|mlp|both} {natural|robust} {mnist|fashionmnist|cifar10}``,
lines 756-986):

  * per-dataset config (network, batch size, base-sample rate, optimizer,
    LR schedule, normalized-range clamps, PGD epsilon) — lines 783-870;
  * natural training: MLP = NLL on log-softmax outputs (``train``, :489-538),
    GL = per-batch Laplace head on base+batch features with custom CE
    (``train_supervised``, :521-610);
  * robust training: 5-iteration PGD inner loop with random init, epsilon
    -ball and data-range clamps (``train_pgd``/``train_GL_pgd``, :613-754);
  * per-epoch eval (``test``/``test_GL``) and state_dict-style checkpoints
    into ``models/``.

Run: python -m graphlearninglayer_tpu.train.adversarial_driver gl robust mnist
"""
from __future__ import annotations

import os
import sys
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..attack.pgd import make_gl_pgd_perturb_p, make_mlp_pgd_perturb_p
from ..data import Transform, load_dataset, select_base_indices
from ..data.datasets import parse_synth_overrides
from ..models import (PreActResNetFeat, SmallCNN, SmallCNNGL, l2_normalize,
                      resnet18)
from ..ops import laplace_learning
from ..utils.checkpoint import save_checkpoint
from ..utils.meters import drain_correct
from .losses import custom_ce_loss
from .trainer import TrainState, _apply, create_train_state

__all__ = ["DATASET_CONFIGS", "run", "main"]


@dataclass
class AdvConfig:
    dataset: str
    network_gl: str
    network_mlp: str
    min_val: float | np.ndarray
    max_val: float | np.ndarray
    pgd_epsilon: float
    batch_size: int
    base_sample_rate: int  # base samples per class
    lr: float
    epochs: int
    adam: bool = False
    lr_gamma: float = 1.0
    lr_step: int = 10 ** 9
    pgd_alpha: float = 0.01
    pgd_iters: int = 5
    # graph-op regularizer; the reference drivers use the op default tau=0
    # (train_and_adversarial.py:552) — kept for the real datasets.  The
    # synthetic smoke config uses a tiny tau so collapsed-feature batches
    # (coincident points -> zero-degree nodes) stay solvable.
    gl_tau: float = 0.0


# reference train_and_adversarial.py:783-870 (epochs scaled down by CLI flag
# if desired; these are the reference's values)
DATASET_CONFIGS = {
    "mnist": AdvConfig("mnist", "smallcnn_gl", "smallcnn", -0.425, 2.822,
                       0.3, 1000, 10, 0.01, 100, adam=True, lr_gamma=0.1,
                       lr_step=25),
    "fashionmnist": AdvConfig("fashionmnist", "resnet18", "resnet18",
                              -0.8102, 2.0227, 0.05, 2000, 20, 0.01, 100,
                              adam=True, lr_gamma=0.5, lr_step=10),
    "cifar10": AdvConfig("cifar10", "preactresnet18", "preactresnet18",
                         np.array([-1.9895, -1.9803, -1.7068],
                                  np.float32).reshape(1, 1, 1, 3),
                         np.array([2.0591, 2.1265, 2.1158],
                                  np.float32).reshape(1, 1, 1, 3),
                         0.05, 200, 10, 0.1, 150),
    # offline-friendly small config for smoke runs
    "synthetic": AdvConfig("synthetic", "smallcnn_gl", "smallcnn", -1.0, 1.0,
                           0.1, 256, 8, 0.01, 3, adam=True, gl_tau=1e-6),
}


def build_network(name: str, num_classes: int = 10):
    """Returns (module, output_extractor).  Extractor is identity for
    single-output modules; tuple-output modules ((pred, feat)) are unpacked
    by the caller."""
    if name == "smallcnn_gl":
        return SmallCNNGL(), lambda out: out
    if name == "smallcnn":
        return SmallCNN(num_classes=num_classes), lambda out: out
    if name == "resnet18":
        # fashion-MNIST path: buildnet(resnet18, head=linear, softmax)
        # for both GL and MLP (train_and_adversarial.py:900-904,927-931)
        from ..models import BuildNet
        return BuildNet(name="resnet18", head="linear", feat_dim=128,
                        num_classes=num_classes, softmax=True), None
    if name == "preactresnet18":
        return PreActResNetFeat(num_classes=num_classes), None
    raise ValueError(name)


def _make_schedule(cfg: AdvConfig, steps_per_epoch: int):
    if cfg.dataset == "cifar10":
        # CosineAnnealingLR(T_max=150) stepped per epoch
        # (train_and_adversarial.py:913,938)
        return optax.cosine_decay_schedule(cfg.lr,
                                           150 * steps_per_epoch)
    if cfg.lr_step < 10 ** 8:
        return optax.exponential_decay(
            cfg.lr, transition_steps=cfg.lr_step * steps_per_epoch,
            decay_rate=cfg.lr_gamma, staircase=True)
    return cfg.lr


def _make_tx(cfg: AdvConfig, target: str, schedule):
    """Per-dataset/target optimizer (train_and_adversarial.py:888-941):
    mnist GL=Adam / MLP=SGD(momentum 0.9, wd 5e-4); fashionmnist Adam both;
    cifar10 SGD(momentum 0.9, wd 5e-4) + cosine both."""
    if cfg.dataset == "mnist" and target == "mlp":
        return optax.chain(optax.add_decayed_weights(5e-4),
                           optax.trace(decay=0.9),
                           optax.scale_by_learning_rate(schedule))
    if cfg.dataset == "cifar10":
        return optax.chain(optax.add_decayed_weights(5e-4),
                           optax.trace(decay=0.9),
                           optax.scale_by_learning_rate(schedule))
    if cfg.adam:
        return optax.adam(schedule)
    return optax.sgd(schedule, momentum=0.9)


def run(model_type: str, rob_or_nat: str, dataset: str,
        epochs: int | None = None, save_dir: str = "models",
        seed: int = 1, synth: dict | None = None) -> dict:
    cfg = DATASET_CONFIGS[dataset]
    if epochs is not None:
        cfg = AdvConfig(**{**cfg.__dict__, "epochs": epochs})
    spec = load_dataset("fashion_mnist" if dataset == "fashionmnist"
                        else dataset, allow_synthetic_fallback=True,
                        **(synth or {}))
    tf_name = ("fashion_mnist" if dataset == "fashionmnist" else
               dataset if dataset in ("mnist", "cifar10") else "synthetic")
    tf = Transform(tf_name, "eval")
    num_classes = spec.num_classes
    rng_np = np.random.default_rng(seed)

    min_val = jnp.asarray(cfg.min_val)
    max_val = jnp.asarray(cfg.max_val)
    results = {}

    targets = ["gl", "mlp"] if model_type == "both" else [model_type]
    for target in targets:
        is_gl = target == "gl"
        net_name = cfg.network_gl if is_gl else cfg.network_mlp
        module, extract = build_network(net_name, num_classes)
        steps_per_epoch = max(len(spec.train_labels) // cfg.batch_size, 1)
        schedule = _make_schedule(cfg, steps_per_epoch)
        tx = _make_tx(cfg, target, schedule)
        sample = jnp.zeros((1, *spec.image_shape), jnp.float32)
        state = create_train_state(module, tx,
                                   jax.random.PRNGKey(seed), sample)

        def model_out(params, batch_stats, x, train):
            out, new_stats = _apply(module, params, batch_stats, x,
                                    train=train,
                                    rng=jax.random.PRNGKey(0) if train
                                    else None)
            return out, new_stats

        def gl_features(params, batch_stats, x, train):
            out, new_stats = model_out(params, batch_stats, x, train)
            if isinstance(out, tuple):
                return out[1], new_stats
            return (extract(out) if extract else out), new_stats

        def mlp_logp(params, batch_stats, x, train):
            out, new_stats = model_out(params, batch_stats, x, train)
            if isinstance(out, tuple):
                return out[0], new_stats
            return out, new_stats

        @jax.jit
        def gl_train_step(state: TrainState, base_x, base_y, x, y):
            def loss_fn(params):
                data = jnp.concatenate([base_x, x], axis=0)
                feats, new_stats = gl_features(params, state.batch_stats,
                                               data, True)
                label_matrix = jax.nn.one_hot(base_y, num_classes,
                                              dtype=feats.dtype)
                # adversarial drivers use op defaults tau=0, epsilon='auto'
                # (train_and_adversarial.py:552)
                pred = laplace_learning(feats, label_matrix, tau=cfg.gl_tau,
                                        epsilon="auto", k=25)
                return custom_ce_loss(pred, y), new_stats

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, new_stats, opt_state,
                              state.step + 1), loss

        @jax.jit
        def mlp_train_step(state: TrainState, x, y):
            def loss_fn(params):
                logp, new_stats = mlp_logp(params, state.batch_stats, x,
                                           True)
                onehot = jax.nn.one_hot(y, num_classes, dtype=logp.dtype)
                return -jnp.mean(jnp.sum(onehot * logp, axis=1)), new_stats

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, new_stats, opt_state,
                              state.step + 1), loss

        # PGD perturbation fns built ONCE per target with live params as
        # arguments (a per-batch closure would retrace every step)
        def apply_feats(params, batch_stats, imgs):
            return gl_features(params, batch_stats, imgs, False)[0]

        def apply_logp(params, batch_stats, imgs):
            return mlp_logp(params, batch_stats, imgs, False)[0]

        gl_perturb = make_gl_pgd_perturb_p(
            apply_feats, num_classes, tau=cfg.gl_tau, k=25,
            eps=cfg.pgd_epsilon,
            alpha=cfg.pgd_alpha, num_iters=cfg.pgd_iters)
        mlp_perturb = make_mlp_pgd_perturb_p(
            apply_logp, eps=cfg.pgd_epsilon, alpha=cfg.pgd_alpha,
            num_iters=cfg.pgd_iters)

        @jax.jit
        def gl_pred(params, batch_stats, base_x, base_y, x):
            data = jnp.concatenate([base_x, x], axis=0)
            feats = apply_feats(params, batch_stats, data)
            label_matrix = jax.nn.one_hot(base_y, num_classes,
                                          dtype=feats.dtype)
            pred = laplace_learning(feats, label_matrix, tau=cfg.gl_tau,
                                    epsilon="auto", k=25)
            return jnp.argmax(pred, axis=1)

        @jax.jit
        def mlp_pred(params, batch_stats, x):
            return jnp.argmax(apply_logp(params, batch_stats, x), axis=1)

        # Device-resident dataset: one bulk transfer up front instead of
        # re-shipping every sample each epoch through the relay link
        # (~55 MB/s; a CIFAR-sized f32 train set costs ~11 s ONCE vs per
        # epoch).  Batches become on-device row gathers — large contiguous
        # rows, which TPU gathers handle efficiently (unlike the per-edge
        # 1-D gathers documented in benchmarks/RESULTS.md).
        train_x = jax.device_put(tf.normalize(spec.train_images))
        train_y = jax.device_put(spec.train_labels)
        test_x = jax.device_put(tf.normalize(spec.test_images))

        base_idx = select_base_indices(spec.train_labels,
                                       cfg.base_sample_rate * num_classes,
                                       num_classes, "random", rng=rng_np)
        base_x = jnp.take(train_x, jnp.asarray(base_idx), axis=0)
        base_y = jnp.asarray(spec.train_labels[base_idx])

        print(f"[{target}/{rob_or_nat}/{dataset}] training "
              f"({steps_per_epoch} steps/epoch)...", flush=True)
        for epoch in range(1, cfg.epochs + 1):
            t0 = time.time()
            order = rng_np.permutation(len(spec.train_labels))
            # losses stay device futures until epoch end so consecutive
            # steps pipeline (a per-step float() sync costs a full relay
            # round trip — the dominant per-step latency, see
            # benchmarks/probe_step_overhead.py)
            pending = []
            for i in range(steps_per_epoch):
                sel = jnp.asarray(
                    order[i * cfg.batch_size:(i + 1) * cfg.batch_size])
                x = jnp.take(train_x, sel, axis=0)
                y = jnp.take(train_y, sel, axis=0)
                if rob_or_nat == "robust":
                    key = jax.random.PRNGKey(seed + epoch * 1000 + i)
                    if is_gl:
                        x = gl_perturb(state.params, state.batch_stats,
                                       base_x, base_y, x, y, key, min_val,
                                       max_val)
                    else:
                        x = mlp_perturb(state.params, state.batch_stats,
                                        x, y, key, min_val, max_val)
                if is_gl:
                    state, loss = gl_train_step(state, base_x, base_y, x, y)
                else:
                    state, loss = mlp_train_step(state, x, y)
                pending.append(loss)
            total_loss = float(np.sum(np.asarray(jnp.stack(pending))))
            nb = len(pending)
            print(f"[{target}/{rob_or_nat}/{dataset}] epoch {epoch} "
                  f"avg loss {total_loss / nb:.4f} "
                  f"({time.time() - t0:.1f}s)")

            # per-epoch eval (test / test_GL, train_and_adversarial.py:960-969)
            # eval batch is capped at the test-set size: a test split
            # smaller than the training batch (synthetic fallback) would
            # otherwise make `usable` zero and silently skip the eval
            eval_bs = min(cfg.batch_size, len(spec.test_labels))
            usable = (len(spec.test_labels) // eval_bs) * eval_bs
            preds = []
            for j in range(0, usable, eval_bs):
                xb = jax.lax.slice_in_dim(test_x, j, j + eval_bs)
                preds.append(gl_pred(state.params, state.batch_stats, base_x,
                                     base_y, xb) if is_gl
                             else mlp_pred(state.params, state.batch_stats,
                                           xb))
            correct = drain_correct(preds, spec.test_labels[:usable])
            count = usable
            acc = correct / max(count, 1)
            print(f"  test acc: {acc:.4f}")
            results[f"{target}_acc"] = acc

        os.makedirs(save_dir, exist_ok=True)
        save_checkpoint(os.path.join(
            save_dir, f"{dataset}_{target}_{rob_or_nat}"), state, cfg.epochs)
    return results


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    # trailing key=value tokens are synthetic-generator overrides
    # (e.g. synth_sep=1.0 n_train=20000) for hardened-proxy runs
    synth = parse_synth_overrides([a for a in argv if "=" in a])
    argv = [a for a in argv if "=" not in a]
    if len(argv) < 3:
        raise SystemExit("usage: adversarial_driver {gl|mlp|both} "
                         "{natural|robust} {mnist|fashionmnist|cifar10|synthetic}"
                         " [epochs] [synth_sep=F n_train=N ...]")
    model_type, rob_or_nat, dataset = argv[0], argv[1], argv[2]
    if model_type not in ("gl", "mlp", "both"):
        raise ValueError("argument must be gl, mlp, or both")
    if rob_or_nat not in ("natural", "robust"):
        raise ValueError("argument must be natural or robust")
    epochs = int(argv[3]) if len(argv) > 3 else None
    print("Classifier:", model_type)
    return run(model_type, rob_or_nat, dataset, epochs=epochs, synth=synth)


if __name__ == "__main__":
    main()
