from .mesh import P, make_mesh, replicate, shard
from .multihost import global_mesh, initialize_multihost, is_multihost

__all__ = ["P", "make_mesh", "replicate", "shard",
           "global_mesh", "initialize_multihost", "is_multihost"]
