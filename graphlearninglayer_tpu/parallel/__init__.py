from .edge_shard import (build_edge_shard_plan, edge_sharded_solve,
                         edge_sharded_transductive_laplace, sharded_knn)
from .mesh import P, make_mesh, replicate, shard
from .multihost import global_mesh, initialize_multihost, is_multihost

__all__ = ["P", "make_mesh", "replicate", "shard",
           "global_mesh", "initialize_multihost", "is_multihost",
           "sharded_knn", "edge_sharded_transductive_laplace",
           "edge_sharded_solve", "build_edge_shard_plan"]
