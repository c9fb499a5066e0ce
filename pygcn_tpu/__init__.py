"""pygcn_tpu — a TPU-native graph neural network framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
``LinChen-65/pygcn`` (PyTorch GCN fork for COVID-19 vaccine-policy research):

- ``pygcn_tpu.graph``    — immutable graph containers (COO/CSR/BCSR), normalizations,
  dataset builders (Planetoid/Cora format, co-visitation graphs, synthetic).
- ``pygcn_tpu.ops``      — the sparse engine: SpMM (segment-sum, dense, Pallas
  block-sparse), SDDMM, gather/scatter; custom VJPs pairing forward SpMM with
  transpose-SpMM backward.
- ``pygcn_tpu.nn``       — functional module system + the model zoo mirroring the
  reference (GCN, GeneratorGCN, MLP heads, masked pooling, attention scorer,
  GCN_OVER_MLP surrogate evaluator, policy generators).
- ``pygcn_tpu.parallel`` — device-mesh sharding: edge-partitioned distributed SpMM
  with halo exchange over ICI via ``shard_map`` collectives.
- ``pygcn_tpu.train``    — jitted train steps, early stopping, LR plateau scheduling,
  checkpointing, metrics (MSE / accuracy / Spearman).
- ``pygcn_tpu.sim``      — the metapopulation epidemic simulator as a TPU workload
  (``lax.scan`` over hours, ``vmap`` over Monte-Carlo seeds).
- ``pygcn_tpu.policy``   — differentiable top-K, hierarchical, and REINFORCE policy
  generators with replay buffer and simulation memo-cache.
- ``pygcn_tpu.data``     — vaccination-result CSV / demographic-feature pipelines.
"""

__version__ = "0.1.0"

from pygcn_tpu.graph.graph import Graph  # noqa: F401
from pygcn_tpu.ops.spmm import spmm  # noqa: F401
