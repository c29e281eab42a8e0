"""Free-space wave propagation in JAX — the waveprop subset the
reference depends on (SURVEY §2.7): bandlimited angular spectrum,
Fresnel transfer-function propagation, spherical point-source
wavefronts.  All functions are jittable and differentiable — they sit
in the trainable-mask PSF-simulation path
(lensless/hardware/trainable_mask.py:212-250, slm.py:316-408,
mask.py:196-245).

Conventions: fields are complex arrays (..., H, W); ``pitch`` is the
sampling pitch (dy, dx) in meters; ``wv`` the wavelength in meters;
``dz`` the propagation distance in meters.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _freq_grids(shape, pitch):
    ny, nx = shape
    fy = np.fft.fftfreq(ny, d=pitch[0])
    fx = np.fft.fftfreq(nx, d=pitch[1])
    return np.meshgrid(fy, fx, indexing="ij")


@partial(jax.jit, static_argnames=("pitch", "pad", "bandlimit"))
def angular_spectrum(u_in, wv, pitch, dz, pad: bool = True, bandlimit: bool = True):
    """Bandlimited angular-spectrum propagation (Matsushima & Shimobaba
    2009), the method behind Mask.compute_psf (mask.py:196-245).

    u_in : complex (..., H, W) field at the source plane.
    Returns the complex field at distance ``dz``.
    """
    u_in = jnp.asarray(u_in)
    ny, nx = u_in.shape[-2], u_in.shape[-1]
    if pad:
        py, px = ny // 2, nx // 2
        u = jnp.pad(u_in, [(0, 0)] * (u_in.ndim - 2) + [(py, py), (px, px)])
    else:
        u = u_in
    Ny, Nx = u.shape[-2], u.shape[-1]

    fyy, fxx = _freq_grids((Ny, Nx), pitch)
    fyy = jnp.asarray(fyy)
    fxx = jnp.asarray(fxx)

    arg = 1.0 - (wv * fxx) ** 2 - (wv * fyy) ** 2
    kz = 2.0 * jnp.pi / wv * jnp.sqrt(jnp.maximum(arg, 0.0))
    H = jnp.where(arg > 0, jnp.exp(1j * kz * jnp.abs(dz)), 0.0 + 0.0j)
    H = jnp.where(jnp.asarray(dz) >= 0, H, jnp.conj(H))

    if bandlimit:
        # Matsushima bandlimit: |fx| <= 1/(wv sqrt((2 dz dfx)^2 + 1))
        dfx = 1.0 / (Nx * pitch[1])
        dfy = 1.0 / (Ny * pitch[0])
        fx_lim = 1.0 / (wv * jnp.sqrt((2.0 * dfx * jnp.abs(dz)) ** 2 + 1.0))
        fy_lim = 1.0 / (wv * jnp.sqrt((2.0 * dfy * jnp.abs(dz)) ** 2 + 1.0))
        H = jnp.where(
            (jnp.abs(fxx) <= fx_lim) & (jnp.abs(fyy) <= fy_lim), H, 0.0 + 0.0j
        )

    u_out = jnp.fft.ifft2(jnp.fft.fft2(u, axes=(-2, -1)) * H, axes=(-2, -1))
    if pad:
        u_out = u_out[..., py : py + ny, px : px + nx]
    return u_out


@partial(jax.jit, static_argnames=("pitch", "pad"))
def fresnel_conv(u_in, wv, pitch, dz, pad: bool = True):
    """Fresnel propagation via the transfer function
    ``exp(ikz) exp(-i pi wv z (fx^2 + fy^2))`` (waveprop.fresnel.fresnel_conv
    analog; used by PhaseContour phase retrieval, mask.py:775-820)."""
    u_in = jnp.asarray(u_in)
    ny, nx = u_in.shape[-2], u_in.shape[-1]
    if pad:
        py, px = ny // 2, nx // 2
        u = jnp.pad(u_in, [(0, 0)] * (u_in.ndim - 2) + [(py, py), (px, px)])
    else:
        u = u_in
    Ny, Nx = u.shape[-2], u.shape[-1]
    fyy, fxx = _freq_grids((Ny, Nx), pitch)
    k = 2.0 * jnp.pi / wv
    H = jnp.exp(1j * k * dz) * jnp.exp(
        -1j * jnp.pi * wv * dz * (jnp.asarray(fxx) ** 2 + jnp.asarray(fyy) ** 2)
    )
    u_out = jnp.fft.ifft2(jnp.fft.fft2(u, axes=(-2, -1)) * H, axes=(-2, -1))
    if pad:
        u_out = u_out[..., py : py + ny, px : px + nx]
    return u_out


@partial(jax.jit, static_argnames=("shape", "pitch"))
def spherical_wavefront(shape, pitch, wv, dz):
    """Spherical wavefront from an on-axis point source at distance
    ``dz``: exp(i k r) / r on the (H, W) grid (waveprop.spherical_prop
    analog; scene->mask illumination in slm.py:375-384)."""
    ny, nx = shape
    y = (np.arange(ny) - (ny - 1) / 2.0) * pitch[0]
    x = (np.arange(nx) - (nx - 1) / 2.0) * pitch[1]
    yy, xx = np.meshgrid(y, x, indexing="ij")
    r = jnp.sqrt(jnp.asarray(yy) ** 2 + jnp.asarray(xx) ** 2 + dz**2)
    k = 2.0 * jnp.pi / wv
    field = jnp.exp(1j * k * r) / r
    # normalize peak amplitude to 1 for stable PSF scaling
    return field / jnp.max(jnp.abs(field))
