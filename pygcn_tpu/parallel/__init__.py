from pygcn_tpu.parallel.mesh import make_mesh
from pygcn_tpu.parallel.partition import DistPlan, build_dist_plan
from pygcn_tpu.parallel.dist_spmm import make_dist_spmm

__all__ = ["make_mesh", "DistPlan", "build_dist_plan", "make_dist_spmm"]
