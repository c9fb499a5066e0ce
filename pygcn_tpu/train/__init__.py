from pygcn_tpu.train.metrics import accuracy, mse, spearman
from pygcn_tpu.train.optim import ReduceLROnPlateau, adam_l2
from pygcn_tpu.train.loop import EarlyStopping
from pygcn_tpu.train.checkpoint import (
    get_checkpoint_state,
    load_checkpoint,
    save_checkpoint_state,
)
from pygcn_tpu.train.preempt import PreemptionGuard

__all__ = [
    "PreemptionGuard",
    "accuracy",
    "mse",
    "spearman",
    "adam_l2",
    "ReduceLROnPlateau",
    "EarlyStopping",
    "save_checkpoint_state",
    "get_checkpoint_state",
    "load_checkpoint",
    "OrbaxCheckpointer",
]


def __getattr__(name):
    # lazy: orbax import is heavy and only needed for distributed checkpoints
    if name == "OrbaxCheckpointer":
        from pygcn_tpu.train.checkpoint_orbax import OrbaxCheckpointer

        return OrbaxCheckpointer
    raise AttributeError(name)
