"""1-channel (MNIST-style) ResNet variants and SupCon wrappers.

Equivalent of reference networks/resnet_MNIST.py:12-237: the same CIFAR
-style ResNet trunk with ``in_channel=1``, plus the SupCon-era wrappers —
``SupConResNet`` (encoder + normalized projection head), ``SupCEResNet``
(encoder + linear classifier), ``LinearClassifier`` (probe head) and the
small LeNet-style ``Net``.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .cnn import l2_normalize
from .resnet import BasicBlock, Bottleneck, ResNet

__all__ = ["mnist_resnet18", "mnist_resnet34", "mnist_resnet50",
           "mnist_resnet101", "mnist_model_dict", "SupConResNet",
           "SupCEResNet", "LinearClassifier", "SmallNet"]


def mnist_resnet18():
    return ResNet(BasicBlock, (2, 2, 2, 2))


def mnist_resnet34():
    return ResNet(BasicBlock, (3, 4, 6, 3))


def mnist_resnet50():
    return ResNet(Bottleneck, (3, 4, 6, 3))


def mnist_resnet101():
    return ResNet(Bottleneck, (3, 4, 23, 3))


# name -> (constructor, feature dim), reference resnet_MNIST.py:143-148
mnist_model_dict = {
    "resnet18": (mnist_resnet18, 512),
    "resnet34": (mnist_resnet34, 512),
    "resnet50": (mnist_resnet50, 2048),
    "resnet101": (mnist_resnet101, 2048),
}


class SupConResNet(nn.Module):
    """Encoder + 'linear'/'mlp' projection head, L2-normalized output
    (resnet_MNIST.py:165-186)."""

    name: str = "resnet50"
    head: str = "mlp"
    feat_dim: int = 128

    @nn.compact
    def __call__(self, x, train: bool = True):
        model_fn, dim_in = mnist_model_dict[self.name]
        feat = model_fn()(x, train)
        if self.head == "linear":
            feat = nn.Dense(self.feat_dim)(feat)
        elif self.head == "mlp":
            feat = nn.Dense(dim_in)(feat)
            feat = nn.relu(feat)
            feat = nn.Dense(self.feat_dim)(feat)
        else:
            raise NotImplementedError(f"head not supported: {self.head}")
        return l2_normalize(feat)


class SupCEResNet(nn.Module):
    """Encoder + linear classifier (resnet_MNIST.py:189-198)."""

    name: str = "resnet50"
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = True):
        model_fn, _ = mnist_model_dict[self.name]
        feat = model_fn()(x, train)
        return nn.Dense(self.num_classes)(feat)


class LinearClassifier(nn.Module):
    """Linear probe over frozen features (resnet_MNIST.py:201-210)."""

    name: str = "resnet50"
    num_classes: int = 10

    @nn.compact
    def __call__(self, features):
        return nn.Dense(self.num_classes)(features)


class SmallNet(nn.Module):
    """LeNet-style conv net (the legacy ``Net``, resnet_MNIST.py:213-237)."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.relu(nn.Conv(32, (3, 3), padding="VALID")(x))
        x = nn.relu(nn.Conv(64, (3, 3), padding="VALID")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Dropout(0.25, deterministic=not train)(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(128)(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.log_softmax(nn.Dense(self.num_classes)(x), axis=1)
