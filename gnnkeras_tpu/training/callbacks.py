"""Minimal Keras-style callback protocol for the fit loop.

The reference passes ``tf.keras.callbacks`` through to ``Model.fit``
(per-layer lists in LGNN serial mode, LGNN.py:300-304); this provides the
equivalents actually useful here."""

from __future__ import annotations

import copy
from typing import Optional


class Callback:
    def set_model(self, model) -> None:
        self.model = model

    def on_train_begin(self, logs=None) -> None:
        pass

    def on_epoch_end(self, epoch: int, logs=None) -> None:
        pass

    def on_train_end(self, logs=None) -> None:
        pass

    @property
    def stop_training(self) -> bool:
        return getattr(self, "_stop", False)


class History(Callback):
    """Collects per-epoch logs; returned by ``fit`` like Keras History."""

    def __init__(self):
        self.history: dict = {}
        self.epoch: list = []

    def on_epoch_end(self, epoch, logs=None):
        self.epoch.append(epoch)
        for key, value in (logs or {}).items():
            self.history.setdefault(key, []).append(value)


class EarlyStopping(Callback):
    def __init__(
        self,
        monitor: str = "val_loss",
        min_delta: float = 0.0,
        patience: int = 0,
        mode: str = "min",
        restore_best_weights: bool = False,
    ):
        self.monitor = monitor
        self.min_delta = abs(min_delta)
        self.patience = patience
        self.mode = mode
        self.restore_best_weights = restore_best_weights
        self.best: Optional[float] = None
        self.wait = 0
        self._stop = False
        self._best_vars = None

    def _improved(self, current: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "max":
            return current > self.best + self.min_delta
        return current < self.best - self.min_delta

    def on_epoch_end(self, epoch, logs=None):
        logs = logs or {}
        current = logs.get(self.monitor)
        if current is None:
            return
        if self._improved(float(current)):
            self.best = float(current)
            self.wait = 0
            if self.restore_best_weights and getattr(self, "model", None) is not None:
                self._best_vars = copy.deepcopy(self.model.variables)
        else:
            self.wait += 1
            if self.wait > self.patience:
                self._stop = True

    def on_train_end(self, logs=None):
        if self.restore_best_weights and self._best_vars is not None:
            self.model.variables = self._best_vars
