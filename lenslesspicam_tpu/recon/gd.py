"""Projected gradient descent / Nesterov / FISTA — jit fixed-point loops.

Functional re-design of lensless/recon/gd.py:62-241.  Numerics match the
reference:

* padded convolver with the reference's default ``norm="ortho"`` quirk
  (H uses ortho scaling, data FFTs use backward — rfft_convolve.py:129,146);
* init at per-channel half intensity of the PSF: ``(max + min) / 2``
  (gd.py:99-105);
* step size ``alpha = lip_fact / max_k |H_k|^2`` per channel
  (gd.py:107-126), default ``lip_fact=1.8``;
* gradient ``H^T (H x - y)`` (gd.py:128-130); projection = clip >= 0;
* FISTA t_k sequence per Beck & Teboulle eq. 4.2 (gd.py:235-241);
  Nesterov momentum (gd.py:183-188).

3-D PSFs are supported with the reference's broadcast semantics: the
measurement broadcasts against the depth axis, i.e. depths reconstruct
independently (gd.py via rfft_convolve broadcasting).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.fft_conv import FFTConvolver


def make_convolver(psf, dtype=jnp.float32, pad_policy: str = "ref", norm: str = "ortho") -> FFTConvolver:
    return FFTConvolver.from_psf(psf, pad=True, norm=norm, dtype=dtype, pad_policy=pad_policy)


def half_intensity_init(conv: FFTConvolver, psf, batch_size: int = 1) -> jax.Array:
    """Per-channel (max+min)/2 of the PSF, broadcast to image shape (gd.py:99-105)."""
    psf = jnp.asarray(psf, conv.H.real.dtype)
    flat = psf.reshape(-1, psf.shape[-1])
    pixel_start = (jnp.max(flat, axis=0) + jnp.min(flat, axis=0)) / 2.0
    return jnp.ones((batch_size,) + conv.psf_shape, psf.dtype) * pixel_start


def step_size(conv: FFTConvolver, lip_fact: float = 1.8) -> jax.Array:
    """alpha = lip_fact / max |H|^2, per channel (gd.py:107-126)."""
    mag = conv.mag_sq()  # (D, Ph, Pw/2+1, C)
    return lip_fact / jnp.max(mag.reshape(-1, mag.shape[-1]), axis=0)


def _promote(data, dtype):
    data = jnp.asarray(data, dtype)
    if data.ndim == 3:
        data = data[None, None]
    elif data.ndim == 4:
        data = data[None]
    return data


def _grad(conv: FFTConvolver, image, data):
    return conv.deconvolve(conv.convolve(image) - data)


class GDConfig(NamedTuple):
    lip_fact: float = 1.8
    mu: float = 0.9  # Nesterov momentum
    tk: float = 1.0  # FISTA initial t_k


def run(
    conv: FFTConvolver,
    psf,
    data,
    n_iter: int = 100,
    method: str = "fista",
    config: GDConfig = GDConfig(),
    initial_est=None,
    proj=lambda x: jnp.maximum(x, 0.0),
    initial_state=None,
    return_state: bool = False,
) -> jax.Array:
    """Projected GD family; returns ``(batch, depth, H, W, C)``.

    method in {"vanilla", "nesterov", "fista"} (gd.py GradientDescentUpdate).
    ``n_iter`` may be traced (single executable across iteration sweeps).
    ``initial_state``/``return_state`` support exact chunked solving
    (apply(disp_iter=...) progress display continues the full carry)."""
    dtype = conv.H.real.dtype
    data = _promote(data, dtype)
    batch = data.shape[0]
    alpha = step_size(conv, config.lip_fact)
    if initial_est is not None:
        image = jnp.broadcast_to(jnp.asarray(initial_est, dtype), (batch,) + conv.psf_shape)
    else:
        image = half_intensity_init(conv, psf, batch)

    if method == "vanilla":

        def body(_, im):
            return proj(im - alpha * _grad(conv, im, data))

        carry = image if initial_state is None else initial_state
        carry = jax.lax.fori_loop(0, n_iter, body, carry)
        return (carry, carry) if return_state else carry

    if method == "nesterov":
        mu = config.mu

        def body(_, carry):
            im, p = carry
            p_new = mu * p - alpha * _grad(conv, im, data)
            im = proj(im - mu * p + (1 + mu) * p_new)
            return (im, p_new)

        carry = ((image, jnp.zeros_like(image)) if initial_state is None
                 else initial_state)
        carry = jax.lax.fori_loop(0, n_iter, body, carry)
        return (carry[0], carry) if return_state else carry[0]

    if method == "fista":

        def body(_, carry):
            im, xk, tk = carry
            xk_new = proj(im - alpha * _grad(conv, im, data))
            tk_new = (1.0 + jnp.sqrt(1.0 + 4.0 * tk**2)) / 2.0
            im_new = xk_new + (tk - 1.0) / tk_new * (xk_new - xk)
            return (im_new, xk_new, tk_new)

        carry = ((image, image, jnp.asarray(config.tk, dtype))
                 if initial_state is None else initial_state)
        carry = jax.lax.fori_loop(0, n_iter, body, carry)
        # the reference returns proj(image_est) as the viewable image
        # (gd.py:136-140 _form_image applied in apply())
        return (proj(carry[0]), carry) if return_state else proj(carry[0])

    raise ValueError(f"unknown method: {method!r}")


@jax.jit
def _run_fista_jit(conv, psf, data, n_iter):
    return run(conv, psf, data, n_iter, method="fista")


def fista(psf, data, n_iter=100, **kwargs):
    """Convenience one-shot FISTA from a raw PSF."""
    conv = make_convolver(psf, **kwargs)
    return _run_fista_jit(conv, jnp.asarray(psf), data, jnp.asarray(n_iter))
