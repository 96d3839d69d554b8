"""CIFAR-style ResNet encoders (flax.linen).

TPU-native equivalents of the reference backbones (networks/resnet.py:11-123):
3x3 stem (no maxpool), four stages, global average pool, returning pooled
feature vectors (512-d for BasicBlock nets, 2048-d for Bottleneck nets).
NHWC layout (TPU-preferred); BatchNorm with momentum 0.9 / eps 1e-5 matching
torch defaults.

``dtype`` is the compute dtype (flax mixed-precision convention): pass
``jnp.bfloat16`` to run convs/matmuls on the MXU bf16 path while parameters
(and BatchNorm statistics, which flax always accumulates in float32) stay
float32.  The returned pooled features are always float32 (cast at the
pool) so direct users and the graph op see full precision regardless of
compute dtype.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = lambda: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype)
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, dtype=self.dtype)(x)
        out = nn.relu(norm()(out))
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype)(out)
        out = norm()(out)
        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            x = nn.Conv(self.planes * self.expansion, (1, 1),
                        strides=self.stride, use_bias=False,
                        dtype=self.dtype)(x)
            x = norm()(x)
        return nn.relu(out + x)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = lambda: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype)
        out = nn.relu(norm()(nn.Conv(self.planes, (1, 1), use_bias=False,
                                     dtype=self.dtype)(x)))
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, dtype=self.dtype)(out)
        out = nn.relu(norm()(out))
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      dtype=self.dtype)(out)
        out = norm()(out)
        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            x = nn.Conv(self.planes * self.expansion, (1, 1),
                        strides=self.stride, use_bias=False,
                        dtype=self.dtype)(x)
            x = norm()(x)
        return nn.relu(out + x)


class ResNet(nn.Module):
    """Returns pooled features of dim 512*expansion; input NHWC.

    ``s2d_stem=True`` (opt-in, NOT reference-equivalent): space-to-depth
    patchify stem — 2x2 pixel patches fold into channels (HxWx C ->
    H/2 x W/2 x 4C) before a widened 128-channel stem, and stage 1 runs
    128 channels at the halved resolution.  Same conv FLOP total, but
    every activation fills the TPU's 128-lane tiles: the flagship encoder
    fwd+bwd drops 46.0 -> 33.8 ms on v5e (benchmarks/
    probe_stage1_variants.py; exact-equivalence repacks of the reference
    stage1 were probed and do NOT help — its 64-channel convs are capped
    ~33% MFU by shape, probe_stage1_pairpack.py).
    """

    block: type
    stage_sizes: Sequence[int]
    dtype: Any = jnp.float32
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        if self.s2d_stem:
            b, h, w, c = x.shape
            x = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(
                0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
            stem_width, stage_planes = 128, (128, 128, 256, 512)
        else:
            stem_width, stage_planes = 64, (64, 128, 256, 512)
        out = nn.Conv(stem_width, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype)(x)
        out = nn.relu(nn.BatchNorm(use_running_average=not train,
                                   momentum=0.9, epsilon=1e-5,
                                   dtype=self.dtype)(out))
        for stage, (planes, blocks) in enumerate(
                zip(stage_planes, self.stage_sizes)):
            for i in range(blocks):
                # with the patchify stem the input is already at stage-2
                # resolution, so stage 1 keeps stride 1 and later stages
                # stride as usual
                stride = 2 if (stage > (1 if self.s2d_stem else 0)
                               and i == 0) else 1
                out = self.block(planes, stride, dtype=self.dtype)(out, train)
        # pool in float32 and return float32 features regardless of compute
        # dtype: the graph head consumes these directly, and every encoder in
        # the package keeps full precision at its feature boundary
        return jnp.mean(out.astype(jnp.float32), axis=(1, 2))


def resnet18(dtype=jnp.float32):
    return ResNet(BasicBlock, (2, 2, 2, 2), dtype=dtype)


def resnet18_s2d(dtype=jnp.float32):
    """Space-to-depth-stem ResNet-18 (opt-in TPU-shape variant — see
    ResNet.s2d_stem; ~1.36x faster encoder step at the flagship shape)."""
    return ResNet(BasicBlock, (2, 2, 2, 2), dtype=dtype, s2d_stem=True)


def resnet34(dtype=jnp.float32):
    return ResNet(BasicBlock, (3, 4, 6, 3), dtype=dtype)


def resnet50(dtype=jnp.float32):
    return ResNet(Bottleneck, (3, 4, 6, 3), dtype=dtype)


def resnet101(dtype=jnp.float32):
    return ResNet(Bottleneck, (3, 4, 23, 3), dtype=dtype)
