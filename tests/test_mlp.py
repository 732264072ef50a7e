"""MLP block and shape-algebra tests.

- get_inout_dims reproduces the reference algebra (GNN/Models/MLP.py:82-140)
  for all focuses, layers and state dims;
- the functional MLP matches a same-weights TF/Keras Sequential built the way
  the reference's factory builds it (GNN/Models/MLP.py:12-78), including
  BatchNorm in train and eval mode, which pins down masked-statistics
  correctness.
"""

import numpy as np
import pytest

from gnnkeras_tpu.models.mlp import MLP, get_inout_dims


class TestGetInoutDims:
    def test_homogeneous_state_ds0(self):
        inp, layers = get_inout_dims("state", 14, 3, 2, "g", 0)
        assert inp == [(31,)]  # 2*14 + 3
        assert list(np.ravel(layers)) == [14]

    def test_homogeneous_state_ds(self):
        inp, layers = get_inout_dims("state", 14, 3, 2, "g", 10)
        assert inp == [(51,)]  # 14 + 14 + 3 + 20
        assert layers == [10]

    def test_output_node_focus(self):
        inp, layers = get_inout_dims("output", 14, 3, 2, "n", 10)
        assert inp == [(24,)]
        assert layers == [2]

    def test_output_arc_focus(self):
        inp, layers = get_inout_dims("output", 14, 3, 2, "a", 10)
        # (NL+AL+DS) + NL + DS = 27 + 24
        assert inp == [(51,)]

    def test_lgnn_growth_ds0(self):
        # layer l, get_state & get_output, focus != 'a':
        # NL_l = NL + l*NL + ((l-1)+1)*T  (MLP.py:114)
        for layer, expect in [(0, 31), (1, 2 * (14 + 14 + 2) + 3), (2, 2 * (14 + 28 + 4) + 3)]:
            inp, _ = get_inout_dims("state", 14, 3, 2, "g", 0, layer=layer, get_state=True, get_output=True)
            assert inp == [(expect,)], (layer, inp)

    def test_lgnn_growth_ds(self):
        inp0, _ = get_inout_dims("state", 14, 3, 2, "g", 10, layer=0, get_state=True, get_output=True)
        inp1, _ = get_inout_dims("state", 14, 3, 2, "g", 10, layer=1, get_state=True, get_output=True)
        assert inp0 == [(51,)]
        assert inp1 == [(75,)]  # NL grows by DS+T=12 → (26+26+3+20)
        inp5, _ = get_inout_dims("state", 14, 3, 2, "g", 10, layer=5, get_state=True, get_output=True)
        assert inp5 == inp1  # DS>0 growth does not compound

    def test_arc_focus_grows_arc_label(self):
        inp0, _ = get_inout_dims("state", 14, 3, 2, "a", 10, layer=1, get_state=True, get_output=True)
        # NL + DS = 24 per node; AL + T = 5; 24 + 24 + 5 + 20 = 73
        assert inp0 == [(73,)]

    def test_composite_multi_type(self):
        inp, layers = get_inout_dims("state", (4, 6), 3, 2, "n", 10)
        # per type: NL_t + sum(NL) + AL + 2*DS
        assert inp == [(4 + 10 + 3 + 20,), (6 + 10 + 3 + 20,)]
        assert layers == [10]

    def test_hidden_units(self):
        _, layers = get_inout_dims("state", 14, 3, 2, "g", 10, hidden_units=[32, 16])
        assert layers == [32, 16, 10]


@pytest.fixture(scope="module")
def tf():
    tf = pytest.importorskip("tensorflow")
    tf.keras.backend.set_floatx("float32")
    return tf


def _build_keras_mlp(tf, input_dim, layers, activations, batch_normalization, dropout=None):
    from tensorflow.keras.layers import BatchNormalization, Dense, Dropout
    from tensorflow.keras.models import Sequential

    ls = []
    if batch_normalization:
        ls.append(BatchNormalization(input_shape=input_dim))
    for i, (u, a) in enumerate(zip(layers, activations)):
        ls.append(Dense(u, activation=a))
    model = Sequential(ls)
    model.build((None,) + tuple(input_dim))
    return model


def _transplant(tf, keras_model, ours: MLP, variables):
    """Copy Keras weights into our param pytree (same layer order)."""
    params = [dict(p) for p in variables["params"]]
    k_layers = [l for l in keras_model.layers]
    import jax.numpy as jnp

    ki = 0
    for idx, layer in enumerate(ours.program):
        if layer[0] == "dense":
            while "dense" not in k_layers[ki].name:
                ki += 1
            w, b = k_layers[ki].get_weights()
            params[idx]["kernel"] = jnp.asarray(w)
            params[idx]["bias"] = jnp.asarray(b)
            ki += 1
        elif layer[0] == "batch_norm":
            while "batch_normalization" not in k_layers[ki].name:
                ki += 1
            gamma, beta, mm, mv = k_layers[ki].get_weights()
            params[idx]["gamma"] = jnp.asarray(gamma)
            params[idx]["beta"] = jnp.asarray(beta)
            state = [dict(s) for s in variables["state"]]
            state[idx]["moving_mean"] = jnp.asarray(mm)
            state[idx]["moving_var"] = jnp.asarray(mv)
            variables = {"params": params, "state": state}
            ki += 1
    return {"params": params, "state": variables["state"]}


class TestKerasParity:
    @pytest.mark.parametrize("bn", [False, True])
    @pytest.mark.parametrize("act", ["selu", "softmax", "relu"])
    def test_eval_mode_matches_keras(self, tf, bn, act):
        import jax

        rng = np.random.default_rng(0)
        x = rng.normal(size=(16, 7)).astype(np.float32)
        ours = MLP(input_dim=(7,), layers=[5, 3], activations=act, batch_normalization=bn)
        variables = ours.init(jax.random.PRNGKey(0))
        keras_model = _build_keras_mlp(tf, (7,), [5, 3], [act, act], bn)
        variables = _transplant(tf, keras_model, ours, variables)

        y_ref = keras_model(x, training=False).numpy()
        y_ours, _ = ours.apply(variables, x, training=False)
        np.testing.assert_allclose(np.asarray(y_ours), y_ref, rtol=1e-5, atol=1e-6)

    def test_train_mode_bn_matches_keras(self, tf):
        import jax

        rng = np.random.default_rng(1)
        x = rng.normal(size=(32, 7)).astype(np.float32) * 3 + 1
        ours = MLP(input_dim=(7,), layers=[4], activations="selu", batch_normalization=True)
        variables = ours.init(jax.random.PRNGKey(0))
        keras_model = _build_keras_mlp(tf, (7,), [4], ["selu"], True)
        variables = _transplant(tf, keras_model, ours, variables)

        y_ref = keras_model(x, training=True).numpy()
        y_ours, new_state = ours.apply(variables, x, training=True)
        np.testing.assert_allclose(np.asarray(y_ours), y_ref, rtol=1e-4, atol=1e-5)

        # moving statistics updated identically (momentum 0.99)
        mm_ref, mv_ref = keras_model.layers[0].get_weights()[2:]
        np.testing.assert_allclose(np.asarray(new_state[0]["moving_mean"]), mm_ref, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(new_state[0]["moving_var"]), mv_ref, rtol=1e-3, atol=1e-5)

    def test_masked_bn_equals_unpadded(self, tf):
        """BN over a padded batch with mask == BN over the dense batch: the
        core padding-inertness property."""
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(2)
        x_real = rng.normal(size=(10, 5)).astype(np.float32)
        x_pad = np.concatenate([x_real, 99.0 * np.ones((6, 5), np.float32)])
        mask = np.array([True] * 10 + [False] * 6)

        ours = MLP(input_dim=(5,), layers=[4], activations="selu", batch_normalization=True)
        variables = ours.init(jax.random.PRNGKey(0))

        y_dense, st_dense = ours.apply(variables, jnp.asarray(x_real), training=True)
        y_masked, st_masked = ours.apply(variables, jnp.asarray(x_pad), training=True, mask=jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(y_masked)[:10], np.asarray(y_dense), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(st_masked[0]["moving_mean"]), np.asarray(st_dense[0]["moving_mean"]), rtol=1e-6
        )


class TestDropout:
    def test_dropout_positions(self):
        m = MLP(input_dim=(4,), layers=[8, 2], activations="relu", dropout_rate=0.5, dropout_pos=1, batch_normalization=False)
        kinds = [l[0] for l in m.program]
        assert kinds == ["dense", "dropout", "dense"]

    def test_alpha_dropout_flag(self):
        m = MLP(input_dim=(4,), layers=[8], activations="selu", dropout_rate=0.3, dropout_pos=0, alphadropout=True, batch_normalization=False)
        assert m.program[0] == ("dropout", 0.3, True)

    def test_dropout_off_in_eval(self):
        import jax
        import jax.numpy as jnp

        m = MLP(input_dim=(4,), layers=[8], activations="relu", dropout_rate=0.9, dropout_pos=0, batch_normalization=False)
        v = m.init(jax.random.PRNGKey(0))
        x = jnp.ones((3, 4))
        y1, _ = m.apply(v, x, training=False, rng=jax.random.PRNGKey(1))
        y2, _ = m.apply(v, x, training=False)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))

    def test_param_count(self):
        import jax

        m = MLP(input_dim=(7,), layers=[5, 3], activations="relu", batch_normalization=True)
        v = m.init(jax.random.PRNGKey(0))
        # BN: 2*7 trainable; dense1: 7*5+5; dense2: 5*3+3
        assert m.count_params(v) == 14 + 40 + 18


class TestAlphaDropoutStats:
    def test_alpha_dropout_preserves_moments(self):
        """Keras AlphaDropout keeps the self-normalizing property: mean~0,
        var~1 inputs stay mean~0 var~1 under dropout (unlike plain dropout)."""
        import jax
        import jax.numpy as jnp

        m = MLP(input_dim=(64,), layers=[64], activations="linear",
                kernel_initializer="zeros", bias_initializer="zeros",
                dropout_rate=0.3, dropout_pos=0, alphadropout=True,
                batch_normalization=False)
        # the dropout layer sits before the (zeroed) dense; probe its output
        # by applying only the dropout stage manually
        from gnnkeras_tpu.models.mlp import _dropout_apply

        x = jax.random.normal(jax.random.PRNGKey(0), (20000, 64))
        y = _dropout_apply(0.3, True, x, True, jax.random.PRNGKey(1))
        assert abs(float(jnp.mean(y))) < 0.02
        assert abs(float(jnp.var(y)) - 1.0) < 0.05

    def test_plain_dropout_scales(self):
        import jax
        import jax.numpy as jnp

        from gnnkeras_tpu.models.mlp import _dropout_apply

        x = jnp.ones((10000, 16))
        y = _dropout_apply(0.5, False, x, True, jax.random.PRNGKey(2))
        # inverted dropout: surviving units scaled by 1/(1-rate); mean preserved
        assert abs(float(jnp.mean(y)) - 1.0) < 0.05
        vals = np.unique(np.asarray(y))
        assert set(np.round(vals, 3)).issubset({0.0, 2.0})
