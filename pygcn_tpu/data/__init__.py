from pygcn_tpu.data.vac_results import combine_vac_results, load_vac_results
from pygcn_tpu.data.loader import ArrayLoader, make_split_loaders
from pygcn_tpu.data.features import assemble_evaluator_features, centrality_features

__all__ = [
    "load_vac_results",
    "combine_vac_results",
    "ArrayLoader",
    "make_split_loaders",
    "assemble_evaluator_features",
    "centrality_features",
]
