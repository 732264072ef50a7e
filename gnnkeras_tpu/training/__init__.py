from gnnkeras_tpu.training import losses, metrics, optimizers
from gnnkeras_tpu.training.trainer import fit, evaluate, predict
from gnnkeras_tpu.training.callbacks import Callback, EarlyStopping, History

__all__ = [
    "losses",
    "metrics",
    "optimizers",
    "fit",
    "evaluate",
    "predict",
    "Callback",
    "EarlyStopping",
    "History",
]
