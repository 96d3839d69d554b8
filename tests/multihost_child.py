import sys

pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

from graphlearninglayer_tpu.parallel.multihost import (
    global_mesh, initialize_multihost, is_multihost)

ok = initialize_multihost(coordinator=coord, num_processes=nproc,
                          process_id=pid)
assert ok, "initialize_multihost returned False with explicit coordinator"
assert jax.process_count() == nproc, jax.process_count()
assert is_multihost()

mesh = global_mesh(axes=("data", "graph"))
assert mesh.devices.shape == (nproc, 2), mesh.devices.shape

import functools

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

sharding = NamedSharding(mesh, P(("data", "graph")))
n = nproc * 2
garr = jax.make_array_from_callback(
    (n,), sharding, lambda idx: np.arange(n, dtype=np.float32)[idx])


@functools.partial(jax.shard_map, mesh=mesh,
                   in_specs=P(("data", "graph")), out_specs=P())
def total(x):
    return jax.lax.psum(jnp.sum(x), ("data", "graph"))


out = total(garr)
val = float(np.asarray(out.addressable_data(0)))
expect = float(np.arange(n).sum())
assert val == expect, (val, expect)
print(f"MULTIHOST_OK pid={pid} psum={val}", flush=True)
