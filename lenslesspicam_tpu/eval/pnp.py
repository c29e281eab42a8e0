"""Parameterize-and-Perturb (Gilton et al.) self-supervised test-time
adaptation (reference: lensless/eval/benchmark.py:32-43, 199-240).

Given a measurement ``y`` and trained model parameters ``theta_0``, run
SGD on

    mean((normalize(H f_theta(y)) - y)^2) + mu * mean((theta - theta_0)^2)

and return the adapted prediction.  The reference runs a torch SGD loop
per image with one autograd graph per step; here the *entire adaptation
loop* is a single jit ``lax.fori_loop`` over SGD steps — one compiled
executable per model/shape, reused across the evaluation set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.fft_conv import FFTConvolver


def _param_distance(params, params0):
    leaves = jax.tree_util.tree_leaves(params)
    leaves0 = jax.tree_util.tree_leaves(params0)
    num = sum(jnp.sum((a - b) ** 2) for a, b in zip(leaves, leaves0))
    count = sum(a.size for a in leaves)
    return num / count


def parameterize_perturb(
    apply_fn,
    params0,
    forward_conv: FFTConvolver,
    lensless: jax.Array,
    mu: float = 1e-3,
    lr: float = 1e-3,
    n_iter: int = 50,
):
    """Adapt ``params`` to one measurement batch; returns (prediction,
    adapted_params).

    apply_fn(params, lensless) -> prediction (B, D, H, W, C);
    forward_conv must be a padded convolver (benchmark.py:210-213).
    """

    def loss_fn(params):
        pred = apply_fn(params, lensless)
        y_est = forward_conv.convolve(pred)
        y_est = y_est - jnp.min(y_est)
        y_est = y_est / jnp.maximum(jnp.max(y_est), 1e-12)
        data_fid = jnp.mean((y_est - lensless) ** 2)
        return data_fid + mu * _param_distance(params, params0)

    @jax.jit
    def adapt(params):
        def step(_, p):
            grads = jax.grad(loss_fn)(p)
            return jax.tree_util.tree_map(lambda a, g: a - lr * g, p, grads)

        return jax.lax.fori_loop(0, n_iter, step, params)

    adapted = adapt(params0)
    return apply_fn(adapted, lensless), adapted
