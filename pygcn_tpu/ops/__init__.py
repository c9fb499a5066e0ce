from pygcn_tpu.ops.spmm import spmm, sddmm

__all__ = ["spmm", "sddmm"]
