from gnnkeras_tpu.data.sequencers import (
    MultiGraphSequencer,
    SingleGraphSequencer,
    CompositeMultiGraphSequencer,
    CompositeSingleGraphSequencer,
)
from gnnkeras_tpu.data.transductive import (
    TransductiveMultiGraphSequencer,
    TransductiveSingleGraphSequencer,
)
from gnnkeras_tpu.data.mutag import load_mutag

__all__ = [
    "MultiGraphSequencer",
    "SingleGraphSequencer",
    "CompositeMultiGraphSequencer",
    "CompositeSingleGraphSequencer",
    "TransductiveMultiGraphSequencer",
    "TransductiveSingleGraphSequencer",
    "load_mutag",
]
