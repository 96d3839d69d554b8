"""Attack evaluation driver: FGSM / IFGSM / CW sweeps.

Equivalent of reference ``adversarial.py`` (positional CLI:
``{fgsm|ifgsm|cw} {gl|mlp|both} {robust|natural} {dataset}``, lines 811-829):
loads trained weights, sweeps epsilon in {0, 0.05, ..., 1} for (I)FGSM or
c in {1, 5, 10, 20, 50, 100, 200, 500, 1000} for CW (adversarial.py:953-958),
reports accuracy per point, and saves adversarial-example image grids.

Run: python -m graphlearninglayer_tpu.attack.driver fgsm gl natural synthetic
"""
from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..data import Transform, load_dataset, select_base_indices
from ..data.datasets import parse_synth_overrides
from ..train.adversarial_driver import (DATASET_CONFIGS, build_network,
                                        _make_schedule, _make_tx)
from ..train.trainer import TrainState, _apply, create_train_state
from ..utils.checkpoint import restore_checkpoint
from ..utils.meters import drain_correct
from .cw import make_gl_cw_attack, make_mlp_cw_attack
from .fgsm import make_gl_fast_gradient_attack, make_mlp_fast_gradient_attack

__all__ = ["EPSILON_SWEEP", "C_SWEEP", "run", "main"]

EPSILON_SWEEP = [0.0, 0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.35, 0.4, 0.45,
                 0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95, 1.0]
C_SWEEP = [1, 5, 10, 20, 50, 100, 200, 500, 1000]

# per-dataset base-set rates for attack eval (adversarial.py:500-508,652-658)
FGSM_BASE_RATE = {"mnist": 1000, "fashionmnist": 50, "cifar10": 50,
                  "synthetic": 16}
CW_BASE_RATE = {"mnist": 100, "fashionmnist": 50, "cifar10": 50,
                "synthetic": 16}


def _save_example_grid(clean, adv, path):
    """Adversarial-example strip: clean / adversarial / difference
    (reference image grids, adversarial.py:1015-1089)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        n = min(8, len(clean))
        fig, axes = plt.subplots(3, n, figsize=(2 * n, 6))
        for i in range(n):
            for row, img in enumerate((clean[i], adv[i],
                                       adv[i] - clean[i])):
                ax = axes[row, i] if n > 1 else axes[row]
                im = img.squeeze()
                ax.imshow(im if im.ndim == 2 else
                          (im - im.min()) / (np.ptp(im) + 1e-9))
                ax.axis("off")
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        plt.savefig(path, dpi=100)
        plt.close()
    except Exception as e:
        print(f"example grid skipped: {e}")


def run(attack: str, model_type: str, rob_or_nat: str, dataset: str,
        ckpt_dir: str = "models", batch_size: int | None = None,
        sweep=None, cw_iters: int = 100, seed: int = 1,
        save_images: bool = True, synth: dict | None = None) -> dict:
    cfg = DATASET_CONFIGS[dataset]
    spec = load_dataset("fashion_mnist" if dataset == "fashionmnist"
                        else dataset, allow_synthetic_fallback=True,
                        **(synth or {}))
    tf_name = ("fashion_mnist" if dataset == "fashionmnist" else
               dataset if dataset in ("mnist", "cifar10") else "synthetic")
    tf = Transform(tf_name, "eval")
    num_classes = spec.num_classes
    rng_np = np.random.default_rng(seed)
    batch_size = batch_size or min(cfg.batch_size, 1000)
    min_val = jnp.asarray(cfg.min_val)
    max_val = jnp.asarray(cfg.max_val)

    # device-resident TEST set: one bulk transfer; per-batch attack inputs
    # become on-device slices instead of per-sweep-point re-transfers
    # through the relay link.  The train set is only ever read for the few
    # base rows, so those are gathered on host and shipped alone.
    train_x = tf.normalize(spec.train_images)
    test_x = jax.device_put(tf.normalize(spec.test_images))
    test_y = spec.test_labels

    results = {}
    targets = ["gl", "mlp"] if model_type == "both" else [model_type]
    for target in targets:
        is_gl = target == "gl"
        net_name = cfg.network_gl if is_gl else cfg.network_mlp
        module, extract = build_network(net_name, num_classes)
        schedule = _make_schedule(cfg, 1)
        tx = _make_tx(cfg, target, schedule)
        state = create_train_state(module, tx, jax.random.PRNGKey(seed),
                                   jnp.zeros((1, *spec.image_shape),
                                             jnp.float32))
        ckpt = os.path.join(ckpt_dir, f"{dataset}_{target}_{rob_or_nat}")
        if os.path.isdir(ckpt):
            state, _ = restore_checkpoint(ckpt, state)
            print(f"loaded weights from {ckpt}")
        else:
            print(f"WARNING: no checkpoint at {ckpt}; attacking random init")

        def encode(images):
            out, _ = _apply(module, state.params, state.batch_stats, images,
                            train=False)
            if isinstance(out, tuple):
                return out[1]
            return extract(out) if extract else out

        def classify(images):
            out, _ = _apply(module, state.params, state.batch_stats, images,
                            train=False)
            return out[0] if isinstance(out, tuple) else out

        rate = (FGSM_BASE_RATE if attack in ("fgsm", "ifgsm")
                else CW_BASE_RATE)[dataset]
        base_idx = select_base_indices(spec.train_labels, rate * num_classes,
                                       num_classes, "random", rng=rng_np)
        base_x = jnp.asarray(train_x[base_idx])
        base_y = jnp.asarray(spec.train_labels[base_idx])

        points = sweep if sweep is not None else (
            EPSILON_SWEEP if attack in ("fgsm", "ifgsm") else C_SWEEP)
        curve = []
        usable = (len(spec.test_labels) // batch_size) * batch_size
        # attack fns built ONCE per target — one compile serves the sweep
        if attack in ("fgsm", "ifgsm"):
            atk = (make_gl_fast_gradient_attack(encode, num_classes,
                                                tau=0.0, k=25)
                   if is_gl else make_mlp_fast_gradient_attack(classify))
        else:
            atk = (make_gl_cw_attack(encode, num_classes, tau=0.0, k=25,
                                     iters=cw_iters)
                   if is_gl else make_mlp_cw_attack(classify,
                                                    iters=cw_iters))
        for point in points:
            first_batch = None
            # predictions stay device futures until the sweep point ends so
            # consecutive attack batches pipeline through the relay
            preds = []
            for i in range(0, usable, batch_size):
                x = jax.lax.slice_in_dim(test_x, i, i + batch_size)
                if attack in ("fgsm", "ifgsm"):
                    y = jnp.asarray(test_y[i:i + batch_size])
                    if is_gl:
                        adv, pred = atk(base_x, base_y, x, y, float(point),
                                        attack, min_val, max_val)
                    else:
                        adv, pred = atk(x, y, float(point), attack, min_val,
                                        max_val)
                else:  # cw
                    if is_gl:
                        adv, _, pred = atk(base_x, base_y, x, float(point),
                                           min_val, max_val)
                    else:
                        adv, _, pred = atk(x, float(point), min_val, max_val)
                preds.append(pred)
                if first_batch is None:
                    first_batch = (x, adv)
            correct = drain_correct(preds, test_y[:usable])
            if first_batch is not None:
                first_batch = (np.asarray(first_batch[0]),
                               np.asarray(first_batch[1]))
            acc = correct / max(usable, 1)
            label = "Epsilon" if attack in ("fgsm", "ifgsm") else "c"
            print(f"{label}: {point}\tTest Accuracy = {correct} / {usable}"
                  f" = {acc:.4f}")
            curve.append({"point": float(point), "accuracy": acc})
            if save_images and first_batch is not None:
                _save_example_grid(
                    first_batch[0], first_batch[1],
                    os.path.join("images",
                                 f"{dataset}_{target}_{attack}_{point}.png"))
        results[target] = curve
    return results


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    # trailing key=value tokens select the hardened synthetic generator —
    # must match the adversarial_driver invocation that trained the ckpt
    synth = parse_synth_overrides([a for a in argv if "=" in a])
    argv = [a for a in argv if "=" not in a]
    if len(argv) < 4:
        raise SystemExit("usage: driver {fgsm|ifgsm|cw} {gl|mlp|both} "
                         "{robust|natural} {dataset} [sweep points...] "
                         "[synth_sep=F n_train=N ...]")
    attack, model_type, rob_or_nat, dataset = argv[:4]
    if attack not in ("fgsm", "ifgsm", "cw"):
        raise ValueError("attack must be fgsm, ifgsm, or cw")
    sweep = [float(p) for p in argv[4:]] or None
    results = run(attack, model_type, rob_or_nat, dataset, sweep=sweep,
                  synth=synth)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
