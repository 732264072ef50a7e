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

    # dict-style access so engines that used to return plain history dicts
    # (parallel/packed.py) can return a History without breaking callers
    def __getitem__(self, key):
        return self.history[key]

    def __contains__(self, key):
        return key in self.history

    def items(self):
        return self.history.items()

    def keys(self):
        return self.history.keys()


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


class ReduceLROnPlateau(Callback):
    """Halve (by ``factor``) the live learning rate when ``monitor`` stops
    improving.  Works with any optimizer built through
    ``training.optimizers.get_optimizer`` by name — those carry the learning
    rate in ``opt_state.hyperparams`` (optax.inject_hyperparams), so the rate
    changes without touching the optimizer moments or recompiling the step."""

    def __init__(
        self,
        monitor: str = "val_loss",
        factor: float = 0.5,
        patience: int = 10,
        min_delta: float = 1e-4,
        min_lr: float = 0.0,
        mode: str = "min",
        verbose: int = 0,
    ):
        assert 0.0 < factor < 1.0
        self.monitor = monitor
        self.factor = factor
        self.patience = patience
        self.min_delta = abs(min_delta)
        self.min_lr = min_lr
        self.mode = mode
        self.verbose = verbose
        self.best: Optional[float] = None
        self.wait = 0

    def _improved(self, current: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "max":
            return current > self.best + self.min_delta
        return current < self.best - self.min_delta

    def on_epoch_end(self, epoch, logs=None):
        from gnnkeras_tpu.training.optimizers import current_learning_rate, set_learning_rate

        current = (logs or {}).get(self.monitor)
        if current is None:
            return
        if self._improved(float(current)):
            self.best = float(current)
            self.wait = 0
            return
        self.wait += 1
        if self.wait <= self.patience:
            return
        self.wait = 0
        opt_state = getattr(self.model, "_opt_state", None)
        lr = current_learning_rate(opt_state) if opt_state is not None else None
        if lr is None:
            # a raw optax transformation carries no tunable rate — warn once
            # and keep training rather than destroying the run mid-fit
            if not getattr(self, "_warned", False):
                self._warned = True
                print(
                    "ReduceLROnPlateau: optimizer state carries no learning "
                    "rate (compile with a named optimizer like 'adam:0.01' or "
                    "wrap yours in optax.inject_hyperparams) — no-op"
                )
            return
        new_lr = max(lr * self.factor, self.min_lr)
        if new_lr < lr:
            set_learning_rate(opt_state, new_lr)
            if self.verbose:
                print(f"ReduceLROnPlateau: lr {lr:.2e} -> {new_lr:.2e}")


class TerminateOnNaN(Callback):
    """Stop training when the epoch loss goes NaN/inf (Keras equivalent)."""

    def on_epoch_end(self, epoch, logs=None):
        import math

        loss = (logs or {}).get("loss")
        if loss is not None and not math.isfinite(float(loss)):
            print(f"TerminateOnNaN: non-finite loss {loss} at epoch {epoch + 1}")
            self._stop = True


class CSVLogger(Callback):
    """Append per-epoch logs to a CSV file (Keras equivalent).

    As in Keras, ``append=False`` (the default) truncates the file at
    ``on_train_begin`` — pass ``append=True`` with ``fit(resume=True)`` so a
    resumed run keeps the earlier epochs' rows."""

    def __init__(self, filename: str, append: bool = False):
        self.filename = filename
        self.append = append
        self._file = None
        self._keys = None

    def on_train_begin(self, logs=None):
        import os

        write_header = not (self.append and os.path.exists(self.filename)
                            and os.path.getsize(self.filename) > 0)
        self._file = open(self.filename, "a" if self.append else "w")
        self._keys = None
        self._write_header = write_header

    def on_epoch_end(self, epoch, logs=None):
        logs = logs or {}
        if self._keys is None:
            self._keys = sorted(logs)
            if self._write_header:
                self._file.write(",".join(["epoch"] + self._keys) + "\n")
        row = [str(epoch)] + [f"{float(logs.get(k, float('nan'))):.6g}" for k in self._keys]
        self._file.write(",".join(row) + "\n")
        self._file.flush()

    def on_train_end(self, logs=None):
        if self._file is not None:
            self._file.close()
            self._file = None


class LambdaCallback(Callback):
    """Ad-hoc hooks (Keras equivalent)."""

    def __init__(self, on_train_begin=None, on_epoch_end=None, on_train_end=None):
        self._on_train_begin = on_train_begin
        self._on_epoch_end = on_epoch_end
        self._on_train_end = on_train_end

    def on_train_begin(self, logs=None):
        if self._on_train_begin:
            self._on_train_begin(logs)

    def on_epoch_end(self, epoch, logs=None):
        if self._on_epoch_end:
            self._on_epoch_end(epoch, logs)

    def on_train_end(self, logs=None):
        if self._on_train_end:
            self._on_train_end(logs)
