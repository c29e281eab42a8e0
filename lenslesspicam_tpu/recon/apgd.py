"""Accelerated proximal gradient descent (APGD).

The reference delegates APGD to the external Pycsou solver
(lensless/recon/apgd.py:28-279, pinned-commit dependency).  Here it is a
native jit fixed-point loop: FISTA-accelerated proximal gradient on

    min_x  1/2 ||S H x - y||^2 + lambda_d ||x||^2 + g(x)

with ``g`` one of the reference's ``APGDPriors``: non-negativity
(indicator prox = clip), L1 (soft threshold), or None, and ``S`` an
optional strided subsampling operator so the measurement may live at a
lower resolution than the reconstruction (the reference's
``img_shape`` downsampling composition, apgd.py:154-175).  Step size
1/L with L = max |H|^2 (+ 2 lambda_d; ||S|| <= 1 so the bound holds for
the composed operator), acceleration via the standard t_k sequence —
matching the reference solver's configuration (apgd.py:148-208: diff
prior = squared L2, prox prior = L1 or non-negativity).  The
reference's ``MaxIter | RelError`` stopping criterion (apgd.py:148-150)
maps to a ``lax.while_loop`` with an iteration cap and a relative-step
tolerance.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

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


def make_downsampling_convolver(psf, img_shape, dtype=jnp.float32,
                                pad_policy: str = "ref"):
    """Convolver + integer subsampling factors for a measurement of
    ``img_shape`` (H, W) smaller than the PSF grid: the PSF is resized
    (cubic) to an integer multiple of the measurement shape and the
    forward model becomes ``subsample(conv(x))`` (reference
    apgd.py:154-175, cv2.INTER_CUBIC + pycsou SubSample).

    Returns ``(conv, ds_factor)`` with ``ds_factor`` an (fy, fx) tuple.
    """
    psf = jnp.asarray(psf, dtype)
    rec_shape = np.array(psf.shape[1:3])
    meas_shape = np.array(img_shape[:2])
    assert np.all(meas_shape <= rec_shape), \
        "Image shape must be smaller than PSF shape"
    ds = np.round(rec_shape / meas_shape).astype(int)
    new_hw = tuple(meas_shape * ds)
    if tuple(rec_shape) != new_hw:
        psf = jax.image.resize(
            psf, (psf.shape[0],) + new_hw + (psf.shape[-1],), method="cubic")
    return make_convolver(psf, dtype, pad_policy), (int(ds[0]), int(ds[1]))


def _subsample(x, ds):
    """Strided subsampling on (H, W); equivalent to the reference's
    ``SubSample(..., slice(0, -1, f))`` on integer-multiple grids."""
    return x[..., :: ds[0], :: ds[1], :]


def _subsample_adj(y, ds, full_hw):
    """Adjoint of :func:`_subsample`: zero-filled upsampling."""
    out = jnp.zeros(y.shape[:-3] + full_hw + y.shape[-1:], y.dtype)
    return out.at[..., :: ds[0], :: ds[1], :].set(y)


def run(
    conv: FFTConvolver,
    data,
    n_iter: int = 500,
    prox_penalty: Optional[str] = APGDPriors.NONNEG,
    diff_penalty: Optional[str] = None,
    prox_lambda: float = 1e-5,
    diff_lambda: float = 1e-3,
    acceleration: bool = True,
    ds_factor: Optional[tuple] = None,
    rel_error: Optional[float] = None,
) -> jax.Array:
    """APGD reconstruction; returns (batch, depth, H, W, C).

    ds_factor: (fy, fx) when the measurement is subsampled relative to
        the reconstruction grid (pair with make_downsampling_convolver).
    rel_error: early-stop tolerance on ||x_{k+1} - x_k|| / ||x_k||
        (reference stop.RelError); None runs exactly n_iter iterations.
    """
    dtype = conv.H.real.dtype
    data = jnp.asarray(data, dtype)
    if data.ndim == 3:
        data = data[None, None]
    elif data.ndim == 4:
        data = data[None]
    batch = data.shape[0]
    full_hw = conv.psf_shape[-3:-1]

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
        if ds_factor is None:
            g = conv.deconvolve(conv.convolve(x) - data)
        else:
            r = _subsample(conv.convolve(x), ds_factor) - data
            g = conv.deconvolve(_subsample_adj(r, ds_factor, full_hw))
        if diff_penalty == APGDPriors.L2:
            g = g + 2.0 * diff_lambda * x
        return g

    x0 = jnp.zeros((batch,) + conv.psf_shape, dtype)

    if acceleration:
        def step(x, z, tk):
            x_new = prox(z - alpha * grad(z))
            tk_new = (1.0 + jnp.sqrt(1.0 + 4.0 * tk**2)) / 2.0
            z_new = x_new + (tk - 1.0) / tk_new * (x_new - x)
            return x_new, z_new, tk_new
    else:
        def step(x, z, tk):
            x_new = prox(x - alpha * grad(x))
            return x_new, x_new, tk

    t0 = jnp.asarray(1.0, dtype)
    if rel_error is None:
        def body(_, carry):
            return step(*carry)

        x, _, _ = jax.lax.fori_loop(0, n_iter, body, (x0, x0, t0))
        return x

    # MaxIter | RelError: run until the relative step stalls (while_loop
    # keeps the loop on-device; rel starts at inf so it runs >= 1 iter)
    def cond(carry):
        _, _, _, it, rel = carry
        return jnp.logical_and(it < n_iter, rel > rel_error)

    def wbody(carry):
        x, z, tk, it, _ = carry
        x_new, z_new, tk_new = step(x, z, tk)
        rel = jnp.linalg.norm(x_new - x) / jnp.maximum(
            jnp.linalg.norm(x), jnp.asarray(1e-12, dtype))
        return (x_new, z_new, tk_new, it + 1, rel)

    x, _, _, _, _ = jax.lax.while_loop(
        cond, wbody, (x0, x0, t0, jnp.asarray(0), jnp.asarray(jnp.inf, dtype)))
    return x


@jax.jit
def _run_jit(conv, data, n_iter):
    return run(conv, data, n_iter)


def apgd(psf, data, n_iter=500, img_shape=None, **kwargs):
    """Convenience entry; ``img_shape`` enables the downsampling
    composition (data at img_shape, reconstruction at the PSF grid)."""
    if img_shape is not None:
        conv, ds = make_downsampling_convolver(psf, img_shape)
        kwargs["ds_factor"] = ds
    else:
        conv = make_convolver(psf)
    if kwargs:
        return jax.jit(
            lambda c, d, n: run(c, d, n, **kwargs)
        )(conv, jnp.asarray(data), jnp.asarray(n_iter))
    return _run_jit(conv, jnp.asarray(data), jnp.asarray(n_iter))
