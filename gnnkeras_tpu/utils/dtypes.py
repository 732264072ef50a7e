"""Global float dtype, analogous to the reference's ``tf.keras.backend.floatx()``
(used throughout GNN/graph_class.py:43).  float32 by default; compute-heavy
paths cast to bfloat16 internally where numerically safe."""

import numpy as np

_FLOATX = np.float32


def floatx():
    return _FLOATX


def set_floatx(dtype) -> None:
    global _FLOATX
    _FLOATX = np.dtype(dtype).type
