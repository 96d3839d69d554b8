from .mesh import P, make_mesh, replicate, shard

__all__ = ["P", "make_mesh", "replicate", "shard"]
