"""Pre-activation ResNets (flax.linen).

Equivalent of the reference's two PreActResNet variants:
  * ``PreActResNetFeat`` — feat_dim projection head, returns
    (log-softmax class scores, L2-normalized features)
    (reference networks/preact_resnet.py:65-117); used by the CIFAR-10
    adversarial runs (train_and_adversarial.py:910).
  * ``PreActResNetPlain`` — plain classifier returning (logits, pooled
    features) (reference networks/preactresnet.py:14-111).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .cnn import l2_normalize


class PreActBlock(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = lambda: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype)
        out = nn.relu(norm()(x))
        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            shortcut = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=self.stride, use_bias=False,
                               dtype=self.dtype)(out)
        else:
            shortcut = x
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, dtype=self.dtype)(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype)(nn.relu(norm()(out)))
        return out + shortcut


class PreActBottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = lambda: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype)
        out = nn.relu(norm()(x))
        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            shortcut = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=self.stride, use_bias=False,
                               dtype=self.dtype)(out)
        else:
            shortcut = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      dtype=self.dtype)(out)
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, dtype=self.dtype)(nn.relu(norm()(out)))
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      dtype=self.dtype)(nn.relu(norm()(out)))
        return out + shortcut


class _PreActTrunk(nn.Module):
    block: type
    stage_sizes: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        out = nn.Conv(64, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype)(x.astype(self.dtype))
        for stage, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), self.stage_sizes)):
            for i in range(blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                out = self.block(planes, stride, dtype=self.dtype)(out, train)
        return out


class PreActResNetFeat(nn.Module):
    block: type = PreActBlock
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    feat_dim: int = 128
    num_classes: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        out = _PreActTrunk(self.block, self.stage_sizes,
                           dtype=self.dtype)(x, train)
        out = nn.relu(nn.BatchNorm(use_running_average=not train,
                                   momentum=0.9, epsilon=1e-5,
                                   dtype=self.dtype)(out))
        out = nn.avg_pool(out, (4, 4), strides=(4, 4))
        out = out.reshape(out.shape[0], -1).astype(jnp.float32)
        feat = nn.Dense(self.feat_dim)(out)
        pred = nn.Dense(self.num_classes)(feat)
        return nn.log_softmax(pred, axis=1), l2_normalize(feat)


class PreActResNetPlain(nn.Module):
    block: type = PreActBlock
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    num_classes: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        out = _PreActTrunk(self.block, self.stage_sizes,
                           dtype=self.dtype)(x, train)
        out = nn.avg_pool(out, (4, 4), strides=(4, 4))
        out = out.reshape(out.shape[0], -1).astype(jnp.float32)
        return nn.Dense(self.num_classes)(out), out


def preact_resnet18(**kw):
    return PreActResNetFeat(PreActBlock, (2, 2, 2, 2), **kw)


def preact_resnet34(**kw):
    return PreActResNetFeat(PreActBlock, (3, 4, 6, 3), **kw)


def preact_resnet50(**kw):
    return PreActResNetFeat(PreActBottleneck, (3, 4, 6, 3), **kw)


def preact_resnet101(**kw):
    return PreActResNetFeat(PreActBottleneck, (3, 4, 23, 3), **kw)


def preact_resnet152(**kw):
    return PreActResNetFeat(PreActBottleneck, (3, 8, 36, 3), **kw)
