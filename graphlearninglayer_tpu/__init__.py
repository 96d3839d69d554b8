"""graphlearninglayer_tpu — a TPU-native graph Laplace-learning framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
jwcalder/GraphLearningLayer reference (PyTorch/scipy): a parameter-free graph
classifier head (semi-supervised Laplace learning with implicit-diff
gradients), CNN/ResNet/WRN backbones, fully-supervised + adversarially robust
training drivers, FGSM/IFGSM/CW attacks, and transductive evaluation — all
with static shapes, device-resident graph math, and mesh-sharded execution.
"""

__version__ = "0.1.0"

from .ops import laplace_learning, transductive_laplace, one_hot_encode

__all__ = ["laplace_learning", "transductive_laplace", "one_hot_encode"]
