"""WideResNet feature extractors (flax.linen).

Equivalent of the reference WRN-28-2 / WRN-28-8 (networks/wrn.py:14-85):
pre-activation wide basic blocks with biased convs, no final linear — returns
pooled features (128-d for width 2, 512-d for width 8).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class WideBasic(nn.Module):
    planes: int
    stride: int = 1
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = lambda: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype)
        out = nn.Conv(self.planes, (3, 3), padding=1,
                      dtype=self.dtype)(nn.relu(norm()(x)))
        if self.dropout_rate > 0:
            out = nn.Dropout(self.dropout_rate, deterministic=not train)(out)
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      dtype=self.dtype)(nn.relu(norm()(out)))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride,
                        dtype=self.dtype)(x)
        return out + x


class WideResNet(nn.Module):
    depth: int = 28
    widen_factor: int = 2
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        assert (self.depth - 4) % 6 == 0, "depth must be 6n+4"
        n = (self.depth - 4) // 6
        widths = (16 * self.widen_factor, 32 * self.widen_factor,
                  64 * self.widen_factor)
        out = nn.Conv(16, (3, 3), padding=1,
                      dtype=self.dtype)(x.astype(self.dtype))
        for stage, planes in enumerate(widths):
            for i in range(n):
                stride = 2 if (stage > 0 and i == 0) else 1
                out = WideBasic(planes, stride, self.dropout_rate,
                                dtype=self.dtype)(out, train)
        out = nn.relu(nn.BatchNorm(use_running_average=not train,
                                   momentum=0.9, epsilon=1e-5,
                                   dtype=self.dtype)(out))
        # pool in float32 and return float32 features regardless of compute
        # dtype (feature-boundary precision convention shared by all encoders).
        # The reference pools with a fixed 8x8 window (wrn.py:83) — correct
        # only for 32x32 inputs; clamping the window to the spatial extent
        # keeps it bit-identical there while supporting smaller inputs
        # (28x28 -> 7x7 pre-pool, where a fixed 8 yields a zero-size output)
        # and matching the reference's flatten on larger ones (84x84 -> 2x2
        # windows -> 4x width features).
        win = (min(8, out.shape[1]), min(8, out.shape[2]))
        out = nn.avg_pool(out.astype(jnp.float32), win, strides=win)
        return out.reshape(out.shape[0], -1)


def wrn_28_2(dtype=jnp.float32):
    return WideResNet(28, 2, 0.0, dtype=dtype)


def wrn_28_8(dtype=jnp.float32):
    return WideResNet(28, 8, 0.0, dtype=dtype)
