"""Device prefetch for the fit/evaluate loops.

The sequencers already overlap HOST work (epoch batch rebuild runs on a
background thread, sequencers.py).  This wrapper overlaps the host→device
TRANSFER: it dispatches ``jax.device_put`` for the next ``lookahead`` batches
ahead of use, so batch i+1 streams to HBM while the compiled step for batch i
runs (JAX dispatch is asynchronous, so no thread is needed).  SURVEY §7's
"bucketing + prefetch" data-pipeline item; the reference has no counterpart
(eager TF consumes host tensors in place).

Transparent to the training loops — same ``len / __getitem__ /
on_epoch_end`` protocol:

    gnn.fit(PrefetchSequencer(seq), epochs=10)
"""

from __future__ import annotations

import jax


class PrefetchSequencer:
    """Wraps a sequencer; batches come back device-resident, transferred
    ``lookahead`` steps ahead of use."""

    def __init__(self, sequencer, lookahead: int = 2, device=None):
        assert lookahead >= 1
        self.inner = sequencer
        self.lookahead = int(lookahead)
        self.device = device
        self._cache: dict = {}

    def __len__(self) -> int:
        return len(self.inner)

    def __getitem__(self, i: int):
        n = len(self.inner)
        for j in range(i, min(i + 1 + self.lookahead, n)):
            if j not in self._cache:
                batch = self.inner[j]
                self._cache[j] = (
                    jax.device_put(batch, self.device) if self.device is not None
                    else jax.device_put(batch)
                )
        got = self._cache.pop(i, None)
        return got if got is not None else jax.device_put(self.inner[i])

    def on_epoch_end(self) -> None:
        # shuffle rebuilds the batches — anything transferred ahead is stale
        self._cache.clear()
        self.inner.on_epoch_end()

    def copy(self) -> "PrefetchSequencer":
        return PrefetchSequencer(self.inner.copy(), self.lookahead, self.device)

    def with_graphs(self, graphs) -> "PrefetchSequencer":
        # keep the wrapper (and a fresh cache) around the rebuilt sequencer
        return PrefetchSequencer(self.inner.with_graphs(graphs), self.lookahead, self.device)

    # inner methods that rebuild self.inner.batches: anything already
    # transferred ahead refers to the OLD batches and must be dropped
    _MUTATORS = frozenset({"set_batch_size", "build_batches"})

    def __getattr__(self, name):
        # passthrough for sequencer attributes (focus, data, get_config, ...)
        attr = getattr(self.inner, name)
        if name in PrefetchSequencer._MUTATORS:
            def invalidating(*args, **kwargs):
                self._cache.clear()
                return attr(*args, **kwargs)

            return invalidating
        return attr
