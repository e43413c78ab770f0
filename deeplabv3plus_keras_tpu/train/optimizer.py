"""Optimizer: Keras-semantics Adam with iteration decay + plateau scaling.

Reference compiles with ``optimizers.Adam(lr, beta_1, beta_2, decay)``
(semantic_segmentation.py:477-480, hypers from conf.json:17-20 — notably
β₁=0.5, β₂=0.99) and lowers the LR via ``ReduceLROnPlateau`` (:978-982).

Keras Adam (TF2.4 legacy and Keras 3 alike) folds the bias correction
into the step size and applies ε to the *uncorrected* √v:

  lr_t = lr · 1/(1 + decay · iteration)        (iteration 0-based)
  α_t  = lr_t · √(1−β₂ᵗ)/(1−β₁ᵗ)              (t = iteration + 1)
  m ← β₁·m + (1−β₁)·g ;  v ← β₂·v + (1−β₂)·g²
  θ ← θ − α_t · m/(√v + ε),  ε = 1e-7

This differs from ``optax.scale_by_adam`` (which computes m̂/(√v̂+ε) with
v̂ = v/(1−β₂ᵗ)) exactly in the √v ≈ ε regime — small near-converged
gradients — where the two update magnitudes diverge by ~2× (measured:
4.1e-3 absolute at g=1e-6).  ``_scale_by_keras_adam`` below implements
the Keras placement; cross-checked against ``tf.keras.optimizers.Adam``
to ≤1e-9 at g ∈ {0.5, 1e-6, 1e-8} in tests/test_optimizer_parity.py.

The plateau factor multiplies the injected ``learning_rate`` hyperparam
between epochs (train/callbacks.py), exactly like Keras mutating
``optimizer.lr``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..config import HParams


def _scale_by_keras_adam(b1: float, b2: float, eps: float) -> optax.GradientTransformation:
    """Adam direction with Keras ε placement: √(1−β₂ᵗ)/(1−β₁ᵗ)·m/(√v+ε)."""

    def init_fn(params):
        mu = jax.tree_util.tree_map(jnp.zeros_like, params)
        nu = jax.tree_util.tree_map(jnp.zeros_like, params)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu
        )

    def update_fn(updates, state, params=None):
        del params
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, updates
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * jnp.square(g), state.nu, updates
        )
        count = state.count + 1
        t = count.astype(jnp.result_type(float))  # f32; f64 under x64 tests
        alpha = jnp.sqrt(1.0 - b2**t) / (1.0 - b1**t)
        updates = jax.tree_util.tree_map(
            lambda m, v: alpha.astype(m.dtype) * m / (jnp.sqrt(v) + eps), mu, nu
        )
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(hps: HParams) -> optax.GradientTransformation:
    def adam_with_decay(learning_rate):
        return optax.chain(
            _scale_by_keras_adam(b1=hps.beta_1, b2=hps.beta_2, eps=1e-7),
            optax.scale_by_schedule(lambda t: 1.0 / (1.0 + hps.decay * t)),
            optax.scale(-learning_rate),
        )

    return optax.inject_hyperparams(adam_with_decay)(learning_rate=hps.lr)


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def set_learning_rate(opt_state, lr: float):
    """Host-side LR override (ReduceLROnPlateau port)."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state
