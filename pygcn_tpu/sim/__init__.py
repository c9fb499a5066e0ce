from pygcn_tpu.sim.dist import simulate_policy_batch
from pygcn_tpu.sim.model import (
    EpidemicParams,
    HostVisitSeq,
    VisitSeq,
    simulate,
    simulate_paged,
)

__all__ = [
    "EpidemicParams", "HostVisitSeq", "VisitSeq", "simulate", "simulate_paged",
    "simulate_policy_batch",
]
