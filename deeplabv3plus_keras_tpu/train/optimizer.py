"""Optimizer: Keras-semantics Adam with iteration decay + plateau scaling.

Reference compiles with ``optimizers.Adam(lr, beta_1, beta_2, decay)``
(semantic_segmentation.py:477-480, hypers from conf.json:17-20 — notably
β₁=0.5, β₂=0.99) and lowers the LR via ``ReduceLROnPlateau`` (:978-982).

Keras TF2.4 Adam semantics reproduced here:
  lr_t = lr · 1/(1 + decay · iteration)      (iteration = batch count)
  θ ← θ − lr_t · √(1−β₂ᵗ)/(1−β₁ᵗ) · m/(√v + ε),  ε = 1e-7

The plateau factor multiplies the injected ``learning_rate`` hyperparam
between epochs (train/callbacks.py), exactly like Keras mutating
``optimizer.lr``.
"""

from __future__ import annotations

import optax

from ..config import HParams


def make_optimizer(hps: HParams) -> optax.GradientTransformation:
    def adam_with_decay(learning_rate):
        return optax.chain(
            optax.scale_by_adam(b1=hps.beta_1, b2=hps.beta_2, eps=1e-7),
            optax.scale_by_schedule(lambda t: 1.0 / (1.0 + hps.decay * t)),
            optax.scale(-learning_rate),
        )

    return optax.inject_hyperparams(adam_with_decay)(learning_rate=hps.lr)


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def set_learning_rate(opt_state, lr: float):
    """Host-side LR override (ReduceLROnPlateau port)."""
    import jax.numpy as jnp

    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state
