"""jit training / eval steps for learned reconstruction.

Replaces the reference Trainer's torch inner loop (lensless/recon/
utils.py:947-1176 train_epoch) with pure jit steps: loss -> grad ->
optax update.  Data parallelism comes from sharding the batch over the
mesh 'data' axis; XLA inserts the gradient psum over ICI (the
TPU-native replacement for DataParallel, SURVEY §2.6).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def l2_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def make_train_step(
    apply_fn: Callable,
    optimizer: optax.GradientTransformation,
    loss_fn: Callable = l2_loss,
):
    """Build a jit-able ``(state, conv, lensless, lensed) -> (state, loss)``.

    ``apply_fn(params, conv, lensless) -> prediction`` is typically a
    flax ``model.apply`` closure.
    """

    def step(state: TrainState, conv, lensless, lensed):
        def objective(params):
            pred = apply_fn(params, conv, lensless)
            return loss_fn(pred, lensed)

        loss, grads = jax.value_and_grad(objective)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return step


def init_train_state(params, optimizer) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))
