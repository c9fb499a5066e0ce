from pygcn_tpu.sim.model import EpidemicParams, VisitSeq, simulate

__all__ = ["EpidemicParams", "VisitSeq", "simulate"]
