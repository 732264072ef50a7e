from gnnkeras_tpu.training import losses, metrics, optimizers
from gnnkeras_tpu.training.trainer import fit, evaluate, predict
from gnnkeras_tpu.training.callbacks import (
    Callback,
    CSVLogger,
    EarlyStopping,
    History,
    LambdaCallback,
    ReduceLROnPlateau,
    TerminateOnNaN,
)

__all__ = [
    "losses",
    "metrics",
    "optimizers",
    "fit",
    "evaluate",
    "predict",
    "Callback",
    "CSVLogger",
    "EarlyStopping",
    "History",
    "LambdaCallback",
    "ReduceLROnPlateau",
    "TerminateOnNaN",
]
