"""Device mesh and sharding helpers.

The reference has no distributed backend at all (SURVEY.md §2.3 — its only
"communication" is GPU<->CPU memcpy inside the op).  Here distribution is a
first-class axis of the design:

  * ``data`` axis — batch-sharded CNN backbone (classic DP).  Gradients are
    reduced by XLA-inserted psums over ICI.
  * ``graph`` axis — node/edge-sharded graph head for large graphs: the
    all-pairs distance computation tiles across devices, and CG SpMM
    activations exchange boundary values with XLA collectives.

Meshes are built over ICI within a slice; ``jax.distributed`` handles
multi-host init over DCN (not exercised in single-host CI, but the sharding
code is host-count agnostic).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard", "replicate", "P"]


def make_mesh(n_devices: int | None = None, axes: tuple[str, ...] = ("data",),
              shape: tuple[int, ...] | None = None) -> Mesh:
    """Create a mesh over the first ``n_devices`` devices.

    With one axis, all devices go to it.  With two axes and no explicit
    shape, devices are split as evenly as possible (favoring the leading
    axis).
    """
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if n_devices is not None and n < n_devices:
        raise ValueError(f"requested a {n_devices}-device mesh but only "
                         f"{n} devices are visible")
    if shape is None:
        if len(axes) == 1:
            shape = (n,)
        elif len(axes) == 2:
            a = int(np.floor(np.sqrt(n)))
            while n % a:
                a -= 1
            shape = (n // a, a)
        else:
            raise ValueError("provide an explicit shape for >2 axes")
    return Mesh(np.asarray(devices).reshape(shape), axes)


def shard(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
