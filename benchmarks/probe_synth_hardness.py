"""Calibration probe for the HARD synthetic generator (datasets.py).

For a grid of class_sep values, reports:
  * oracle  — latent-space nearest-mode accuracy on the true latents
              (upper bound ~ Bayes accuracy of the generative model);
  * pixel-oracle — nearest-mode after projecting the noisy uint8 pixels
              back onto the basis (what a perfect encoder can extract);
  * mlp     — small torch-CPU MLP trained on raw pixels (practical model).

Target (VERDICT r4 item 1): a setting where a trained model does NOT
saturate at 100%, with epoch-0 GL transductive from a short pretrain near
the reference's 86.9-87.5% and headroom to ~96%+.

Run: python benchmarks/probe_synth_hardness.py   (CPU-only, no TPU)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from graphlearninglayer_tpu.data.datasets import synthetic_dataset, _smooth_basis


def oracle_acc(sep, modes, noise, n=4096, seed=0, latent_dim=16,
               shape=(32, 32, 3)):
    """Re-derive the generator internals (same seeds) and classify test
    points by nearest mode center, in latent space and from pixels."""
    rng = np.random.default_rng(seed)
    h, w, c = shape
    basis = _smooth_basis(rng, latent_dim, h, w, c)
    amp = 0.22 * np.sqrt(h * w * c / latent_dim)
    centers = rng.normal(0, 1, (10, latent_dim))
    offsets = rng.normal(0, 0.5, (10, modes, latent_dim))
    mode_mu = sep * (centers[:, None, :] + offsets)      # (10, M, D)
    flat_mu = mode_mu.reshape(-1, latent_dim)
    flat_lab = np.repeat(np.arange(10), modes)

    r = np.random.default_rng(seed + 2)                   # test split seeds
    labels = r.integers(0, 10, n)
    mode_idx = r.integers(0, modes, n)
    z = mode_mu[labels, mode_idx] + r.normal(0, 1, (n, latent_dim))

    d = ((z[:, None, :] - flat_mu[None]) ** 2).sum(-1)
    lat_acc = (flat_lab[d.argmin(1)] == labels).mean()

    spec = synthetic_dataset(10, shape, n_train=256, n_test=n, seed=seed,
                             class_sep=sep, modes_per_class=modes,
                             noise_std=noise)
    x = spec.test_images.reshape(n, -1).astype(np.float32) / 255.0
    x = x * 3.0 - 1.5
    z_hat = (x @ basis.T) / amp
    d = ((z_hat[:, None, :] - flat_mu[None]) ** 2).sum(-1)
    pix_acc = (flat_lab[d.argmin(1)] == spec.test_labels).mean()
    return lat_acc, pix_acc


def mlp_acc(sep, modes, noise, n_train=8192, n_test=2048, seed=0,
            shape=(32, 32, 3), epochs=30):
    import torch
    import torch.nn as nn

    spec = synthetic_dataset(10, shape, n_train=n_train, n_test=n_test,
                             seed=seed, class_sep=sep, modes_per_class=modes,
                             noise_std=noise)
    xtr = torch.tensor(spec.train_images.reshape(n_train, -1),
                       dtype=torch.float32) / 255.0
    xte = torch.tensor(spec.test_images.reshape(n_test, -1),
                       dtype=torch.float32) / 255.0
    ytr = torch.tensor(spec.train_labels)
    yte = torch.tensor(spec.test_labels)
    torch.manual_seed(seed)
    net = nn.Sequential(nn.Linear(xtr.shape[1], 256), nn.ReLU(),
                        nn.Linear(256, 128), nn.ReLU(), nn.Linear(128, 10))
    opt = torch.optim.Adam(net.parameters(), 1e-3)
    for ep in range(epochs):
        perm = torch.randperm(n_train)
        for i in range(0, n_train, 256):
            idx = perm[i:i + 256]
            opt.zero_grad()
            loss = nn.functional.cross_entropy(net(xtr[idx]), ytr[idx])
            loss.backward()
            opt.step()
    with torch.no_grad():
        acc = (net(xte).argmax(1) == yte).float().mean().item()
        tracc = (net(xtr).argmax(1) == ytr).float().mean().item()
    return acc, tracc


if __name__ == "__main__":
    modes, noise = 3, 0.35
    print(f"modes={modes} noise={noise} shape=32x32x3 latent=16")
    print(f"{'sep':>5} {'latent-oracle':>13} {'pixel-oracle':>12} "
          f"{'mlp-test':>9} {'mlp-train':>9}")
    for sep in (0.6, 0.8, 1.0, 1.2, 1.5, 2.0):
        lat, pix = oracle_acc(sep, modes, noise)
        mlp, mtr = mlp_acc(sep, modes, noise)
        print(f"{sep:5.2f} {lat:13.4f} {pix:12.4f} {mlp:9.4f} {mtr:9.4f}",
              flush=True)
