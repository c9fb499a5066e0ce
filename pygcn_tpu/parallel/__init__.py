from pygcn_tpu.parallel.mesh import make_mesh
from pygcn_tpu.parallel.partition import DistPlan, build_dist_plan
from pygcn_tpu.parallel.dist_spmm import make_dist_spmm

__all__ = [
    "make_mesh",
    "DistPlan",
    "build_dist_plan",
    "make_dist_spmm",
    "DistGCN",
    "DistGCNOverMLP",
    "TPDistGCN",
    "PipelinedDeepGCN",
    "ExpertParallelMLP",
    "DistGAT",
    "DistSAGE",
    "DistAPPNP",
]


def __getattr__(name):
    # lazy: dist_gcn / dist_evaluator / tp_gcn pull in optax and the nn stack
    if name == "DistGCN":
        from pygcn_tpu.parallel.dist_gcn import DistGCN

        return DistGCN
    if name == "DistGCNOverMLP":
        from pygcn_tpu.parallel.dist_evaluator import DistGCNOverMLP

        return DistGCNOverMLP
    if name == "TPDistGCN":
        from pygcn_tpu.parallel.tp_gcn import TPDistGCN

        return TPDistGCN
    if name == "PipelinedDeepGCN":
        from pygcn_tpu.parallel.pipeline import PipelinedDeepGCN

        return PipelinedDeepGCN
    if name == "ExpertParallelMLP":
        from pygcn_tpu.parallel.moe import ExpertParallelMLP

        return ExpertParallelMLP
    if name == "DistGAT":
        from pygcn_tpu.parallel.dist_gat import DistGAT

        return DistGAT
    if name == "DistSAGE":
        from pygcn_tpu.parallel.dist_sage import DistSAGE

        return DistSAGE
    if name == "DistAPPNP":
        from pygcn_tpu.parallel.dist_sage import DistAPPNP

        return DistAPPNP
    raise AttributeError(name)
