from pygcn_tpu.graph.graph import Graph, BCSR
from pygcn_tpu.graph.transform import (
    add_self_loops,
    row_normalize,
    sym_normalize,
    symmetrize_max,
)

__all__ = [
    "Graph",
    "BCSR",
    "add_self_loops",
    "row_normalize",
    "sym_normalize",
    "symmetrize_max",
]
