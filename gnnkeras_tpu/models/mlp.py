"""Pure-pytree MLP blocks.

Capability-equivalent to the reference's Keras-``Sequential`` factory
(GNN/Models/MLP.py:12-78): an optional leading BatchNorm (on by default), a
Dense stack with per-layer activations/initializers/regularizers, and
(Alpha)Dropout at caller-chosen positions.  Differences, mandated by the TPU
execution model:

- **Functional**: ``MLP`` is a spec; parameters live in an explicit pytree
  (``init`` → variables, ``apply`` → output + updated batch stats) so the
  state-transition net can run inside ``lax.scan`` with donated buffers.
- **Masked statistics**: batches arrive padded; BatchNorm moments and updates
  are computed over ``mask``-selected rows only, so padding is bit-inert and
  activations match the reference's unpadded eager computation.

``get_inout_dims`` reproduces the reference's shape algebra
(GNN/Models/MLP.py:82-140) exactly — including the LGNN layer≥1 input growth —
because every model's wiring depends on it.
"""

from __future__ import annotations

import math
from typing import Any, Callable, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from gnnkeras_tpu.utils.dtypes import floatx

# --------------------------------------------------------------------------
# Initializers (Keras-compatible fan computation, incl. rank-1 bias shapes)
# --------------------------------------------------------------------------

_TRUNC_STD_CORRECTION = 0.87962566103423978  # std of N(0,1) truncated to ±2


def _compute_fans(shape: Sequence[int]) -> Tuple[float, float]:
    if len(shape) < 1:
        return 1.0, 1.0
    if len(shape) == 1:
        return float(shape[0]), float(shape[0])
    receptive = 1
    for d in shape[:-2]:
        receptive *= d
    return float(shape[-2] * receptive), float(shape[-1] * receptive)


def _variance_scaling(scale: float, mode: str, distribution: str):
    def init(key, shape, dtype=None):
        dtype = dtype or floatx()
        fan_in, fan_out = _compute_fans(shape)
        fan = {"fan_in": fan_in, "fan_out": fan_out, "fan_avg": (fan_in + fan_out) / 2.0}[mode]
        fan = max(fan, 1.0)
        if distribution == "truncated_normal":
            stddev = math.sqrt(scale / fan) / _TRUNC_STD_CORRECTION
            return stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
        if distribution == "normal":
            stddev = math.sqrt(scale / fan)
            return stddev * jax.random.normal(key, shape, dtype)
        limit = math.sqrt(3.0 * scale / fan)
        return jax.random.uniform(key, shape, dtype, -limit, limit)

    return init


INITIALIZERS = {
    "zeros": lambda key, shape, dtype=None: jnp.zeros(shape, dtype or floatx()),
    "ones": lambda key, shape, dtype=None: jnp.ones(shape, dtype or floatx()),
    "lecun_normal": _variance_scaling(1.0, "fan_in", "truncated_normal"),
    "lecun_uniform": _variance_scaling(1.0, "fan_in", "uniform"),
    "glorot_normal": _variance_scaling(1.0, "fan_avg", "truncated_normal"),
    "glorot_uniform": _variance_scaling(1.0, "fan_avg", "uniform"),
    "he_normal": _variance_scaling(2.0, "fan_in", "truncated_normal"),
    "he_uniform": _variance_scaling(2.0, "fan_in", "uniform"),
    "random_normal": lambda key, shape, dtype=None: 0.05 * jax.random.normal(key, shape, dtype or floatx()),
    "random_uniform": lambda key, shape, dtype=None: jax.random.uniform(key, shape, dtype or floatx(), -0.05, 0.05),
}


def get_initializer(name_or_fn) -> Callable:
    if callable(name_or_fn):
        return name_or_fn
    try:
        return INITIALIZERS[str(name_or_fn)]
    except KeyError:
        raise ValueError(f"Unknown initializer {name_or_fn!r}; known: {sorted(INITIALIZERS)}")


# --------------------------------------------------------------------------
# Activations
# --------------------------------------------------------------------------

ACTIVATIONS = {
    "linear": lambda x: x,
    None: lambda x: x,
    "relu": jax.nn.relu,
    "selu": jax.nn.selu,
    "elu": jax.nn.elu,
    "gelu": jax.nn.gelu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "softplus": jax.nn.softplus,
    "leaky_relu": jax.nn.leaky_relu,
    "softmax": lambda x: jax.nn.softmax(x, axis=-1),
}


def get_activation(name_or_fn) -> Callable:
    if callable(name_or_fn):
        return name_or_fn
    try:
        return ACTIVATIONS[name_or_fn if name_or_fn is None else str(name_or_fn)]
    except KeyError:
        raise ValueError(f"Unknown activation {name_or_fn!r}; known: {sorted(k for k in ACTIVATIONS if k)}")


# --------------------------------------------------------------------------
# Regularizers
# --------------------------------------------------------------------------


def get_regularizer(spec):
    """'l1' / 'l2' / ('l1_l2', a, b) / callable / None → fn(param) -> scalar."""
    if spec is None:
        return None
    if callable(spec):
        return spec
    if spec == "l1":
        return lambda p: 0.01 * jnp.sum(jnp.abs(p))
    if spec == "l2":
        return lambda p: 0.01 * jnp.sum(jnp.square(p))
    if isinstance(spec, (tuple, list)) and spec and spec[0] == "l1_l2":
        l1, l2 = float(spec[1]), float(spec[2])
        return lambda p: l1 * jnp.sum(jnp.abs(p)) + l2 * jnp.sum(jnp.square(p))
    raise ValueError(f"Unknown regularizer {spec!r}")


# --------------------------------------------------------------------------
# Layers (functional)
# --------------------------------------------------------------------------

_BN_MOMENTUM = 0.99  # Keras BatchNormalization default
_BN_EPS = 1e-3

# Keras AlphaDropout constant: -selu_alpha * selu_scale.
_ALPHA_P = -1.7580993408473766


def _masked_moments(
    x: jax.Array, mask: Optional[jax.Array], axis_name: Optional[str] = None
) -> Tuple[jax.Array, jax.Array]:
    """Masked batch moments; with ``axis_name`` the sums span a mesh axis so
    sharded rows (edge-partitioned graphs) see the same global statistics the
    reference computes over the full unpadded batch."""
    if mask is None:
        m = jnp.ones((x.shape[0], 1), x.dtype)
    else:
        m = mask.astype(x.dtype)[:, None]
    s, sq, c = jnp.sum(x * m, axis=0), None, jnp.sum(m)
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
        c = jax.lax.psum(c, axis_name)
    count = jnp.maximum(c, 1.0)
    mean = s / count
    var_local = jnp.sum(jnp.square(x - mean) * m, axis=0)
    if axis_name is not None:
        var_local = jax.lax.psum(var_local, axis_name)
    var = var_local / count
    return mean, var


def _batch_norm_apply(params, state, x, training, mask, axis_name=None):
    if training:
        mean, var = _masked_moments(x, mask, axis_name)
        new_state = {
            "moving_mean": _BN_MOMENTUM * state["moving_mean"] + (1.0 - _BN_MOMENTUM) * mean,
            "moving_var": _BN_MOMENTUM * state["moving_var"] + (1.0 - _BN_MOMENTUM) * var,
        }
    else:
        mean, var = state["moving_mean"], state["moving_var"]
        new_state = state
    y = (x - mean) * jax.lax.rsqrt(var + _BN_EPS) * params["gamma"] + params["beta"]
    return y, new_state


def _masked_moments_t(
    x: jax.Array, mask: Optional[jax.Array], axis_name: Optional[str] = None
) -> Tuple[jax.Array, jax.Array]:
    """``_masked_moments`` for feature-major (d, N) activations: statistics
    per feature (sublane) over the masked lane (batch) axis."""
    if mask is None:
        m = jnp.ones((1, x.shape[1]), x.dtype)
    else:
        m = mask.astype(x.dtype)[None, :]
    s, c = jnp.sum(x * m, axis=1), jnp.sum(m)
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
        c = jax.lax.psum(c, axis_name)
    count = jnp.maximum(c, 1.0)
    mean = s / count
    var_local = jnp.sum(jnp.square(x - mean[:, None]) * m, axis=1)
    if axis_name is not None:
        var_local = jax.lax.psum(var_local, axis_name)
    var = var_local / count
    return mean, var


def _batch_norm_apply_t(params, state, x, training, mask, axis_name=None):
    if training:
        mean, var = _masked_moments_t(x, mask, axis_name)
        new_state = {
            "moving_mean": _BN_MOMENTUM * state["moving_mean"] + (1.0 - _BN_MOMENTUM) * mean,
            "moving_var": _BN_MOMENTUM * state["moving_var"] + (1.0 - _BN_MOMENTUM) * var,
        }
    else:
        mean, var = state["moving_mean"], state["moving_var"]
        new_state = state
    scale = jax.lax.rsqrt(var + _BN_EPS) * params["gamma"]
    y = (x - mean[:, None]) * scale[:, None] + params["beta"][:, None]
    return y, new_state


def _dropout_apply(rate, alpha, x, training, rng):
    if not training or rate <= 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, shape=x.shape).astype(x.dtype)
    if alpha:
        a = ((1.0 - rate) * (1.0 + rate * _ALPHA_P**2)) ** -0.5
        b = -a * _ALPHA_P * rate
        return a * (x * keep + _ALPHA_P * (1.0 - keep)) + b
    return x * keep / (1.0 - rate)


# --------------------------------------------------------------------------
# MLP spec
# --------------------------------------------------------------------------


def _broadcast(value, n: int, name: str) -> list:
    # tuples count as per-layer specs too: treating ('relu', 'linear') as one
    # scalar would replicate the whole tuple per layer and only fail at the
    # first forward pass, far from the misuse site
    if isinstance(value, (list, tuple)):
        if len(value) != n:
            raise ValueError(f"MLP: {name} must have length {n}, got {len(value)}")
        return list(value)
    return [value for _ in range(n)]


class MLP:
    """Spec + functional init/apply for a Dense stack.

    Mirrors the reference factory's surface (GNN/Models/MLP.py:12-78):
    ``layers`` counts units from the first hidden layer to the output layer;
    a leading BatchNorm is added unless ``batch_normalization=False``;
    dropout layers are spliced at ``dropout_pos`` (positions are indices into
    the Dense stack, offset-corrected the same way, MLP.py:61).
    """

    def __init__(
        self,
        input_dim: Tuple[int, ...],
        layers: Sequence[int],
        activations: Any,
        kernel_initializer: Any = "glorot_uniform",
        bias_initializer: Any = "zeros",
        kernel_regularizer: Any = None,
        bias_regularizer: Any = None,
        dropout_rate: Union[List[float], float, None] = None,
        dropout_pos: Optional[Union[List[int], int]] = None,
        alphadropout: bool = False,
        batch_normalization: bool = True,
        *,
        name: Optional[str] = None,
    ):
        if isinstance(input_dim, (int, np.integer)):
            input_dim = (int(input_dim),)
        self.input_dim = tuple(int(i) for i in input_dim)
        # flatten per element: get_inout_dims emits mixed int / ndarray entries
        # (e.g. [hidden, array([out])]), which np.ravel rejects as ragged
        units = [int(u) for x in list(layers) for u in np.ravel(x)]
        n = len(units)

        acts = _broadcast(activations, n, "activations")
        k_inits = _broadcast(kernel_initializer, n, "kernel_initializer")
        b_inits = _broadcast(bias_initializer, n, "bias_initializer")
        k_regs = _broadcast(kernel_regularizer, n, "kernel_regularizer")
        b_regs = _broadcast(bias_regularizer, n, "bias_regularizer")

        if isinstance(dropout_pos, int):
            dropout_pos = [dropout_pos]
        if isinstance(dropout_rate, float):
            dropout_rate = [dropout_rate for _ in (dropout_pos or [])]
        if dropout_rate is None or dropout_pos is None:
            dropout_rate, dropout_pos = [], []
        if len(dropout_rate) != len(dropout_pos):
            raise ValueError("Dropout parameters must have the same length")

        # Build the layer program: list of ('dense', ...) / ('dropout', ...) /
        # ('batch_norm',), with dropout spliced exactly as the reference does.
        program: List[tuple] = [
            ("dense", u, a, ki, bi, kr, br) for u, a, ki, bi, kr, br in zip(units, acts, k_inits, b_inits, k_regs, b_regs)
        ]
        adjusted = np.array(dropout_pos, dtype=int) + np.arange(len(dropout_pos))
        for rate, pos in zip(dropout_rate, adjusted):
            program.insert(int(pos), ("dropout", float(rate), bool(alphadropout)))
        if batch_normalization:
            program.insert(0, ("batch_norm",))

        self.program = program
        self.name = name
        self.batch_normalization = bool(batch_normalization)
        self.units = units
        self._config = dict(
            input_dim=self.input_dim,
            layers=units,
            activations=activations,
            kernel_initializer=kernel_initializer,
            bias_initializer=bias_initializer,
            kernel_regularizer=kernel_regularizer,
            bias_regularizer=bias_regularizer,
            dropout_rate=dropout_rate or None,
            dropout_pos=dropout_pos or None,
            alphadropout=alphadropout,
            batch_normalization=batch_normalization,
            name=name,
        )

    # -- config / io ---------------------------------------------------------
    def get_config(self) -> dict:
        return dict(self._config)

    @classmethod
    def from_config(cls, config: dict) -> "MLP":
        return cls(**config)

    @property
    def output_dim(self) -> int:
        return self.units[-1]

    def __repr__(self):
        return f"MLP(name={self.name}, in={self.input_dim}, units={self.units}, bn={self.batch_normalization})"

    # -- params --------------------------------------------------------------
    def init(self, rng: jax.Array) -> dict:
        """Returns ``{'params': [...], 'state': [...]}`` aligned with the
        layer program (non-parametric layers hold empty dicts)."""
        params, state = [], []
        feat = self.input_dim[0]
        for layer in self.program:
            if layer[0] == "dense":
                _, out_units, _, ki, bi, _, _ = layer
                rng, k1, k2 = jax.random.split(rng, 3)
                params.append(
                    {
                        "kernel": get_initializer(ki)(k1, (feat, out_units)),
                        "bias": get_initializer(bi)(k2, (out_units,)),
                    }
                )
                state.append({})
                feat = out_units
            elif layer[0] == "batch_norm":
                params.append({"gamma": jnp.ones(feat, floatx()), "beta": jnp.zeros(feat, floatx())})
                state.append({"moving_mean": jnp.zeros(feat, floatx()), "moving_var": jnp.ones(feat, floatx())})
            else:  # dropout
                params.append({})
                state.append({})
        return {"params": params, "state": state}

    # -- forward -------------------------------------------------------------
    def apply(
        self,
        variables: dict,
        x: jax.Array,
        *,
        training: bool = False,
        mask: Optional[jax.Array] = None,
        rng: Optional[jax.Array] = None,
        axis_name: Optional[str] = None,
    ) -> Tuple[jax.Array, List[dict]]:
        """Run the stack. ``mask`` selects real rows for BatchNorm statistics
        (padding is excluded); ``axis_name`` extends those statistics across a
        mesh axis for sharded batches.  Returns (output, new_state_list)."""
        params, state = variables["params"], variables["state"]
        new_state: List[dict] = []
        for layer, p, s in zip(self.program, params, state):
            if layer[0] == "dense":
                _, _, act, _, _, _, _ = layer
                x = x @ p["kernel"] + p["bias"]
                x = get_activation(act)(x)
                new_state.append({})
            elif layer[0] == "batch_norm":
                x, s_new = _batch_norm_apply(p, s, x, training, mask, axis_name)
                new_state.append(s_new)
            else:
                _, rate, alpha = layer
                if rng is not None:
                    rng, sub = jax.random.split(rng)
                else:
                    sub = None
                x = _dropout_apply(rate, alpha, x, training, sub)
                new_state.append({})
        return x, new_state

    def apply_t(
        self,
        variables: dict,
        x: jax.Array,
        *,
        training: bool = False,
        mask: Optional[jax.Array] = None,
        rng: Optional[jax.Array] = None,
        axis_name: Optional[str] = None,
    ) -> Tuple[jax.Array, List[dict]]:
        """Feature-major (transposed) forward: ``x`` is (features, batch) and
        ``mask`` selects real LANES (batch entries).  Same math as ``apply``
        with the axes swapped — the transposed unfold engine (models/gnn.py)
        keeps state feature-major through the convergence loop so the Pallas
        strip kernels never relayout.  Softmax activations normalize over the
        feature (sublane) axis.  Dropout draws its keep mask in (features,
        batch) order, so with a fixed key the realized mask differs from
        ``apply``'s (same distribution)."""
        params, state = variables["params"], variables["state"]
        new_state: List[dict] = []
        for layer, p, s in zip(self.program, params, state):
            if layer[0] == "dense":
                _, _, act, _, _, _, _ = layer
                x = p["kernel"].T @ x + p["bias"][:, None]
                if isinstance(act, str) and act == "softmax":
                    x = jax.nn.softmax(x, axis=0)
                else:
                    x = get_activation(act)(x)
                new_state.append({})
            elif layer[0] == "batch_norm":
                x, s_new = _batch_norm_apply_t(p, s, x, training, mask, axis_name)
                new_state.append(s_new)
            else:
                _, rate, alpha = layer
                if rng is not None:
                    rng, sub = jax.random.split(rng)
                else:
                    sub = None
                x = _dropout_apply(rate, alpha, x, training, sub)
                new_state.append({})
        return x, new_state

    def regularization_loss(self, variables: dict) -> jax.Array:
        """Sum of kernel/bias regularizer penalties (the reference relies on
        Keras ``self.losses``, GNN/Models/GNN.py:286)."""
        total = jnp.zeros((), floatx())
        for layer, p in zip(self.program, variables["params"]):
            if layer[0] != "dense":
                continue
            _, _, _, _, _, kr, br = layer
            kr_fn, br_fn = get_regularizer(kr), get_regularizer(br)
            if kr_fn is not None:
                total = total + kr_fn(p["kernel"])
            if br_fn is not None:
                total = total + br_fn(p["bias"])
        return total

    def count_params(self, variables: dict) -> int:
        return sum(int(np.prod(leaf.shape)) for leaf in jax.tree_util.tree_leaves(variables["params"]))

    def summary(self, variables: Optional[dict] = None) -> str:
        lines = [f"MLP {self.name or ''} (input_dim={self.input_dim})"]
        feat = self.input_dim[0]
        for layer in self.program:
            if layer[0] == "dense":
                lines.append(f"  Dense({feat} -> {layer[1]}, act={layer[2]})")
                feat = layer[1]
            elif layer[0] == "batch_norm":
                lines.append(f"  BatchNormalization({feat})")
            else:
                kind = "AlphaDropout" if layer[2] else "Dropout"
                lines.append(f"  {kind}(rate={layer[1]})")
        if variables is not None:
            lines.append(f"  params: {self.count_params(variables)}")
        text = "\n".join(lines)
        print(text)
        return text


# --------------------------------------------------------------------------
# Shape algebra
# --------------------------------------------------------------------------


def get_inout_dims(
    net_name: str,
    dim_node_label,
    dim_arc_label: int,
    dim_target: int,
    focus: str,
    dim_state: int,
    hidden_units: Optional[Union[int, List[int]]] = None,
    *,
    layer: int = 0,
    get_state: bool = False,
    get_output: bool = False,
) -> Tuple[List[Tuple[int]], list]:
    """Input/output dims for the state and output MLPs.

    Reproduces the reference's algebra (GNN/Models/MLP.py:82-140) exactly,
    including the LGNN layer≥1 growth: with dim_state>0 node labels grow by
    ``DS·get_state + T·(focus≠'a')·get_output`` per layer; with dim_state==0
    the state *is* the node label so growth compounds per layer
    (MLP.py:109-115).  Returns (list of per-type input shapes, layer units).
    """
    assert layer >= 0
    assert focus in ("a", "n", "g")
    assert dim_state >= 0

    NL = np.array(dim_node_label, ndmin=1)
    AL, T = dim_arc_label, dim_target
    DS, GS, GO = dim_state, get_state, get_output

    if layer > 0:
        if DS != 0:
            NL = NL + DS * GS + T * (focus != "a") * GO
            AL = AL + T * (focus == "a") * GO
        else:
            NL = NL + layer * NL * GS + ((layer - 1) * GS + 1) * T * (focus != "a") * GO
            AL = AL + T * (focus == "a") * GO

    if net_name == "state":
        NL_general = np.sum(NL)
        input_shape = list(NL + NL_general + AL + 2 * DS)
        output_shape = DS if DS else NL
    elif net_name == "output":
        if len(NL) > 1:
            NL = np.array([0])
        input_shape = list((focus == "a") * (NL + AL + DS) + NL + DS)
        output_shape = T
    else:
        raise ValueError("net_name not in ['state', 'output']")

    input_shape = [(int(i),) for i in input_shape]

    if not hidden_units:
        hidden_units = []
    if isinstance(hidden_units, int):
        hidden_units = [hidden_units]
    layers = list(hidden_units) + [output_shape]
    return input_shape, layers
