from .knn import knn, knn_tiled, pairwise_dist2
from .graph import (BatchGraph, build_graph, edge_weights, sym_rowsum,
                    sym_spmm, dense_weight_matrix)
from .solve import cholesky_factor, cholesky_solve, stable_conjgrad
from .laplace import LaplaceConfig, laplace_learning
from .transductive import (EvalGraphCache, one_hot_encode,
                           transductive_laplace)

__all__ = [
    "knn", "knn_tiled", "pairwise_dist2",
    "BatchGraph", "build_graph", "edge_weights", "sym_rowsum", "sym_spmm",
    "dense_weight_matrix",
    "cholesky_factor", "cholesky_solve", "stable_conjgrad",
    "LaplaceConfig", "laplace_learning",
    "EvalGraphCache", "one_hot_encode", "transductive_laplace",
]
