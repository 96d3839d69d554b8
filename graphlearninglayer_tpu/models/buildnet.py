"""Backbone + projection-head wrapper (the reference's ``buildnet``).

Equivalent of networks/BuildNet.py:39-101: encoder from the model registry,
a 'linear' / 'mlp' / 'no' projection head to ``feat_dim``, and an auxiliary
MLP classifier (feat_dim -> 32 -> num_classes, optional softmax).  The
forward returns ``(pred, normalized_features)`` — the GLL head consumes the
unit-norm features, the MLP path consumes ``pred``.
"""
from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp

from . import resnet as _resnet
from . import wrn as _wrn
from .cnn import CifarCNN, l2_normalize

# name -> (encoder constructor (dtype kwarg = compute dtype), feature dim)
# — mirrors BuildNet.py:39-47.
model_dict: dict[str, tuple[Callable[..., nn.Module], int]] = {
    "resnet18": (_resnet.resnet18, 512),
    # TPU-shape variant (space-to-depth stem, NOT reference-equivalent;
    # ~1.36x faster encoder step on v5e — models/resnet.py docstring)
    "resnet18_s2d": (_resnet.resnet18_s2d, 512),
    "resnet34": (_resnet.resnet34, 512),
    "resnet50": (_resnet.resnet50, 2048),
    "resnet101": (_resnet.resnet101, 2048),
    "wrn-28-2": (_wrn.wrn_28_2, 128),
    "wrn-28-8": (_wrn.wrn_28_8, 512),
    "cifarcnn": (lambda dtype=jnp.float32: CifarCNN(dtype=dtype), 128),
}


class BuildNet(nn.Module):
    """Encoder -> head -> aux classifier; returns (pred, unit features).

    ``dtype`` is the ENCODER compute dtype (bf16 = the MXU fast path;
    parameters always stay float32).  The projection head, the aux
    classifier and the L2 normalize always run in float32 — the graph op
    consumes the normalized features and needs full-precision distances.
    """

    name: str = "resnet18"
    head: str = "mlp"
    feat_dim: int = 128
    num_classes: int = 10
    softmax: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        model_fn, dim_in = model_dict[self.name]
        feat = model_fn(dtype=self.dtype)(x, train)
        feat = feat.astype(jnp.float32)

        if self.head == "linear":
            feat = nn.Dense(self.feat_dim, name="head_0")(feat)
        elif self.head == "mlp":
            feat = nn.Dense(dim_in, name="head_0")(feat)
            feat = nn.relu(feat)
            feat = nn.Dense(self.feat_dim, name="head_1")(feat)
        elif self.head == "no":
            pass
        else:
            raise NotImplementedError(f"head not supported: {self.head}")

        # aux MLP classifier (named 'linear_*' so the MLP-head pretrain can
        # freeze everything else, reference FullySup.py:34-44)
        pred = nn.Dense(32, name="linear_0")(feat)
        pred = nn.relu(pred)
        pred = nn.Dense(self.num_classes, name="linear_1")(pred)
        if self.softmax:
            pred = nn.softmax(pred, axis=1)
        return pred, l2_normalize(feat)
