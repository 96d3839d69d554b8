"""Small CNN encoders/classifiers (flax.linen).

TPU-native equivalents of:
  * ``customCNN`` — 3-conv MNIST net returning (softmax probs, normalized
    128-d features); feature tap at fc1 (reference networks/customCNN.py:5-36).
  * the Mean-Teacher 13-layer weight-normed ``cifarcnn`` returning normalized
    128-d features (reference networks/cifarcnn.py:12-68).
  * the Osher/Wang "Small-CNN" pair used by the adversarial drivers:
    ``SmallCNN`` (log-softmax classifier) and ``SmallCNNGL`` (same trunk with
    an L2-normalized 200-d feature output, no final linear) — reference
    train_and_adversarial.py:300-422.
All use NHWC layout.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


def l2_normalize(x, axis=-1, eps=1e-12):
    """torch F.normalize semantics: x / max(||x||, eps).

    Written via max *inside* the sqrt so the gradient at x = 0 is exactly
    zero instead of NaN (sqrt'(0) = inf would otherwise poison the chain).
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(sq, eps * eps))


class CustomCNN(nn.Module):
    """28x28x1 input -> (softmax probs over 10 classes, 128-d unit features).

    ``dtype``: compute dtype for the conv/dense stack (bf16 for the MXU
    fast path); the feature tap and the class probabilities are cast back
    to float32 before normalize/softmax so downstream graph math keeps
    full precision."""

    num_classes: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        x = nn.relu(nn.Conv(64, (3, 3), padding=1, dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(128, (3, 3), padding=1, dtype=self.dtype)(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype)(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)  # 7*7*256
        feat = nn.leaky_relu(nn.Dense(128, dtype=self.dtype)(x),
                             negative_slope=0.01)
        x = nn.leaky_relu(nn.Dense(1024, dtype=self.dtype)(feat),
                          negative_slope=0.01)
        x = nn.leaky_relu(nn.Dense(self.num_classes, dtype=self.dtype)(x),
                          negative_slope=0.01)
        x = x.astype(jnp.float32)
        return nn.softmax(x, axis=1), l2_normalize(feat.astype(jnp.float32))


class _WNConv(nn.Module):
    """Conv with weight normalization (torch.nn.utils.weight_norm semantics:
    w = g * v / ||v|| with the norm over all non-output axes)."""

    features: int
    kernel: tuple
    padding: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = nn.Conv(self.features, self.kernel, padding=self.padding,
                       dtype=self.dtype)
        return nn.WeightNorm(conv)(x)


class CifarCNN(nn.Module):
    """Mean-Teacher 13-layer CNN; returns L2-normalized 128-d features."""

    num_classes: int = 10
    dropout_rate: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = lambda v: nn.leaky_relu(v, negative_slope=0.1)
        norm = lambda: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype)
        x = x.astype(self.dtype)
        for features in (128, 128, 128):
            x = act(norm()(_WNConv(features, (3, 3), padding=1,
                                   dtype=self.dtype)(x)))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        for features in (256, 256, 256):
            x = act(norm()(_WNConv(features, (3, 3), padding=1,
                                   dtype=self.dtype)(x)))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = act(norm()(_WNConv(512, (3, 3), padding=0, dtype=self.dtype)(x)))
        x = act(norm()(_WNConv(256, (1, 1), dtype=self.dtype)(x)))
        x = act(norm()(_WNConv(128, (1, 1), dtype=self.dtype)(x)))
        # reference pools a fixed 6x6 window (cifarcnn.py) — correct only
        # for 32x32 inputs (6x6 pre-pool); clamp to the spatial extent so
        # 28x28 inputs (5x5 pre-pool) work while 32x32 stays bit-identical
        win = (min(6, x.shape[1]), min(6, x.shape[2]))
        x = nn.avg_pool(x, win, strides=(2, 2))
        x = x.reshape(x.shape[0], 128)
        return l2_normalize(x.astype(jnp.float32))


class _SmallCNNTrunk(nn.Module):
    """Shared conv trunk + fc stack of the Osher/Wang Small-CNN (valid
    padding, 28x28x1 -> 4x4x64 -> fc 200 -> fc 200)."""

    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.relu(nn.Conv(32, (3, 3), padding="VALID")(x))
        x = nn.relu(nn.Conv(32, (3, 3), padding="VALID")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(nn.Conv(64, (3, 3), padding="VALID")(x))
        x = nn.relu(nn.Conv(64, (3, 3), padding="VALID")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)  # 4*4*64
        x = nn.relu(nn.Dense(200)(x))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return nn.Dense(200)(x)


class SmallCNN(nn.Module):
    """MLP-head variant: returns log-softmax class scores.

    The final classifier linear is zero-initialized (weights AND bias),
    matching the reference's nn.init.constant_(self.linear.{weight,bias}, 0)
    (adversarial.py:305-306) — at epoch 0 the model outputs the uniform
    distribution, which shapes early adversarial-training dynamics."""

    num_classes: int = 10
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = _SmallCNNTrunk(self.dropout_rate)(x, train)
        x = nn.relu(x)
        x = nn.Dense(self.num_classes,
                     kernel_init=nn.initializers.zeros_init(),
                     bias_init=nn.initializers.zeros_init())(x)
        return nn.log_softmax(x, axis=1)


class SmallCNNGL(nn.Module):
    """GL-head variant: returns L2-normalized 200-d features (no final
    linear / relu — reference train_and_adversarial.py:417-421)."""

    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = _SmallCNNTrunk(self.dropout_rate)(x, train)
        return l2_normalize(x)
