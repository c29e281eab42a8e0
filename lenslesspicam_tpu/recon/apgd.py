"""Accelerated proximal gradient descent (APGD).

The reference delegates APGD to the external Pycsou solver
(lensless/recon/apgd.py:28-279, pinned-commit dependency).  Here it is a
native jit fixed-point loop: FISTA-accelerated proximal gradient on

    min_x  1/2 ||H x - y||^2 + lambda_d ||x||^2 + g(x)

with ``g`` one of the reference's ``APGDPriors``: non-negativity
(indicator prox = clip), L1 (soft threshold), or None.  Step size
1/L with L = max |H|^2 (+ 2 lambda_d), acceleration via the standard
t_k sequence — matching the reference solver's configuration
(apgd.py:148-208: diff prior = squared L2, prox prior = L1 or
non-negativity).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.fft_conv import FFTConvolver
from ..ops.tv import soft_thresh


class APGDPriors:
    """Priors for APGD (apgd.py:28-45)."""

    L2 = "l2"
    L1 = "l1"
    NONNEG = "nonneg"

    @staticmethod
    def all_values():
        return [APGDPriors.L2, APGDPriors.L1, APGDPriors.NONNEG]


def make_convolver(psf, dtype=jnp.float32, pad_policy: str = "ref") -> FFTConvolver:
    return FFTConvolver.from_psf(psf, pad=True, norm="ortho", dtype=dtype,
                                 pad_policy=pad_policy)


def run(
    conv: FFTConvolver,
    data,
    n_iter: int = 500,
    prox_penalty: Optional[str] = APGDPriors.NONNEG,
    diff_penalty: Optional[str] = None,
    prox_lambda: float = 1e-5,
    diff_lambda: float = 1e-3,
    acceleration: bool = True,
) -> jax.Array:
    """APGD reconstruction; returns (batch, depth, H, W, C)."""
    dtype = conv.H.real.dtype
    data = jnp.asarray(data, dtype)
    if data.ndim == 3:
        data = data[None, None]
    elif data.ndim == 4:
        data = data[None]
    batch = data.shape[0]

    lip = jnp.max(conv.mag_sq())
    if diff_penalty == APGDPriors.L2:
        lip = lip + 2.0 * diff_lambda
    alpha = 1.0 / lip

    if prox_penalty == APGDPriors.L1:
        def prox(x):
            return soft_thresh(x, alpha * prox_lambda)
    elif prox_penalty == APGDPriors.NONNEG:
        def prox(x):
            return jnp.maximum(x, 0.0)
    else:
        def prox(x):
            return x

    def grad(x):
        g = conv.deconvolve(conv.convolve(x) - data)
        if diff_penalty == APGDPriors.L2:
            g = g + 2.0 * diff_lambda * x
        return g

    x0 = jnp.zeros((batch,) + conv.psf_shape, dtype)

    if acceleration:
        def body(_, carry):
            x, z, tk = carry
            x_new = prox(z - alpha * grad(z))
            tk_new = (1.0 + jnp.sqrt(1.0 + 4.0 * tk**2)) / 2.0
            z_new = x_new + (tk - 1.0) / tk_new * (x_new - x)
            return (x_new, z_new, tk_new)

        x, _, _ = jax.lax.fori_loop(0, n_iter, body, (x0, x0, jnp.asarray(1.0, dtype)))
    else:
        def body(_, x):
            return prox(x - alpha * grad(x))

        x = jax.lax.fori_loop(0, n_iter, body, x0)
    return x


@jax.jit
def _run_jit(conv, data, n_iter):
    return run(conv, data, n_iter)


def apgd(psf, data, n_iter=500, **kwargs):
    conv = make_convolver(psf)
    if kwargs:
        return jax.jit(
            lambda c, d, n: run(c, d, n, **kwargs)
        )(conv, jnp.asarray(data), jnp.asarray(n_iter))
    return _run_jit(conv, jnp.asarray(data), jnp.asarray(n_iter))
