"""Checkpoint / resume.

The reference persists model weights only (per-MLP SavedModel + config.json,
GNN/Models/GNN.py:94-137) and cannot resume optimizer state (load passes
compile=False, GNN.py:134-135).  This module adds full mid-training resume:
params + BatchNorm state + optax optimizer state + epoch counter + host PRNG
key, stored as an Orbax pytree checkpoint with retention."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager for GraphModel training."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        ocp = _ocp()
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, model, extra: Optional[Dict[str, Any]] = None) -> None:
        ocp = _ocp()
        payload = {
            "params": model.variables["params"],
            "model_state": model.variables["state"],
            "opt_state": model._opt_state,
            "rng": model._rng,
        }
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()
        # metadata (epoch, logs) rides in a JSON sidecar; keeping it out of
        # the pytree keeps the restore template structure-stable.  Written
        # atomically (tmp + rename): a torn sidecar must not be mistaken for
        # a missing one at resume time.
        import json

        sidecar = os.path.join(self.directory, f"extra_{step}.json")
        tmp = sidecar + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(dict(extra or {}), f)
        os.replace(tmp, sidecar)
        self._prune_sidecars()

    def _prune_sidecars(self) -> None:
        """Drop metadata sidecars whose checkpoint payload was retired by
        the manager's retention policy."""
        import glob
        import re

        kept = set(self._mgr.all_steps())
        for path in glob.glob(os.path.join(self.directory, "extra_*.json")):
            m = re.match(r"extra_(\d+)\.json$", os.path.basename(path))
            if m and int(m.group(1)) not in kept:
                try:
                    os.unlink(path)
                except OSError:
                    pass

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, model, step: Optional[int] = None) -> Dict[str, Any]:
        """Restore into ``model`` (must be built + compiled so the optimizer
        state tree exists).  Returns the ``extra`` dict (epoch etc.)."""
        ocp = _ocp()
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        model.build()
        if model._opt_state is None:
            if model.optimizer is None:
                raise RuntimeError("compile() the model before restoring (optimizer state tree needed)")
            model._opt_state = model.optimizer.init(model.variables["params"])
        template = {
            "params": model.variables["params"],
            "model_state": model.variables["state"],
            "opt_state": model._opt_state,
            "rng": model._rng,
        }
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        model.variables = {"params": restored["params"], "state": restored["model_state"]}
        model._opt_state = restored["opt_state"]
        # host round-trip: Orbax hands back arrays COMMITTED to device 0, and
        # a committed PRNG key propagates committed-ness into every
        # next_rng() — which conflicts with engines whose shard_map runs on a
        # device SUBSET (expert/pipeline submeshes).  An uncommitted key is
        # placed per the consuming program's specs, like a fresh one.
        import numpy as _np

        model._rng = jax.numpy.asarray(_np.asarray(restored["rng"]))
        import json

        sidecar = os.path.join(self.directory, f"extra_{step}.json")
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                return json.load(f)
        # weights restored but the epoch metadata is gone: resuming "from
        # epoch 0" would silently re-train on trained weights — refuse, but
        # let the caller recover with the restored payload's step number
        raise RuntimeError(
            f"checkpoint step {step} restored but its metadata sidecar "
            f"(extra_{step}.json) is missing — cannot determine the resume "
            "epoch; pass the epoch explicitly or delete the checkpoint"
        )

    def close(self) -> None:
        self._mgr.close()


class CheckpointCallback:
    """Per-epoch checkpointing callback for ``fit``."""

    def __init__(self, directory: str, every_epochs: int = 1, max_to_keep: int = 3):
        self.manager = CheckpointManager(directory, max_to_keep=max_to_keep)
        self.every = int(every_epochs)

    def set_model(self, model):
        self.model = model

    def on_train_begin(self, logs=None):
        pass

    def on_epoch_end(self, epoch, logs=None):
        if (epoch + 1) % self.every == 0:
            self.manager.save(epoch, self.model, extra={"epoch": epoch, **{k: float(v) for k, v in (logs or {}).items()}})

    def on_train_end(self, logs=None):
        pass

    @property
    def stop_training(self):
        return False
