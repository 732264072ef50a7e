"""BatchNorm-statistics recalibration (beyond-reference evaluation aid).

The model family applies BatchNorm inside the convergence loop; evaluation
uses the momentum-0.99 moving statistics (reference MLP.py:67-70 Keras
default).  Short trainings leave those statistics near their init — the
reference faithfully shows the same artifact (BASELINE.md: large test losses
after 30 steps, the serial-LGNN eval drop) — so evaluation can badly
misrepresent a well-trained model.

``recalibrate_batchnorm`` converges the moving statistics WITHOUT touching
the weights: it replays forward passes in training mode over a sequencer,
threading only the BatchNorm-state tree exactly as ``fit`` does.  This is
the standard production fix (a stats-only finalization pass) and is strictly
opt-in — parity with the reference holds when it is not called.
"""

from __future__ import annotations

import jax


def recalibrate_batchnorm(model, sequencer, passes: int = 50, seed: int = 0):
    """Replay ``passes`` epochs of forward passes in training mode, updating
    only the BatchNorm moving statistics (momentum 0.99 each step, as in
    training).  Returns the model (statistics updated in place).

    ~100+ total steps bring the statistics to their fixed point under the
    trained weights; weights, optimizer state and PRNG stream are untouched
    (a dedicated PRNG seeded by ``seed`` drives any random state inits)."""
    model.build()
    cache = getattr(model, "_compiled_cache", None)
    if cache is None:
        model._compiled_cache = cache = {}
    if "bn_step" not in cache:

        def step(params, mstate, batch, rng):
            variables = {"params": params, "state": mstate}
            out = model.forward(variables, batch, training=True, rng=rng)
            return out[-1]  # the updated BatchNorm-state tree

        cache["bn_step"] = jax.jit(step)

    rng = jax.random.PRNGKey(seed)
    params, mstate = model.variables["params"], model.variables["state"]
    batches = [sequencer[i] for i in range(len(sequencer))]
    for _ in range(passes):
        for batch in batches:
            rng, sub = jax.random.split(rng)
            mstate = cache["bn_step"](params, mstate, batch, sub)
    model.variables = {"params": params, "state": mstate}
    return model
