"""Noise models (JAX-native subset of the waveprop dependency).

The reference injects shot noise through ``waveprop.noise.add_shot_noise``
(lensless/utils/dataset.py:329-330, eval/benchmark.py:191-194) and PSF /
background noise at a target SNR (dataset.py:1596-1607, 1894-1907).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def add_shot_noise(image: jax.Array, snr_db: float, key: jax.Array) -> jax.Array:
    """Poisson-like shot noise scaled to the target SNR in dB.

    Follows the waveprop recipe: noise ~ sqrt(image) * N(0,1) (signal-
    dependent), scaled so that 10 log10(P_signal / P_noise) = snr_db,
    output clipped non-negative.
    """
    image = jnp.asarray(image)
    noise = jax.random.normal(key, image.shape, image.dtype) * jnp.sqrt(
        jnp.maximum(image, 0.0)
    )
    sig_var = jnp.mean(image**2)
    noise_var = jnp.mean(noise**2)
    factor = jnp.sqrt(sig_var / jnp.maximum(noise_var, 1e-20) / (10 ** (snr_db / 10.0)))
    return jnp.maximum(image + factor * noise, 0.0)


def add_gaussian_noise_snr(x: jax.Array, snr_db: float, key: jax.Array) -> jax.Array:
    """Additive white gaussian noise at a target SNR in dB
    (dataset.py:1596-1607 PSF noise injection)."""
    x = jnp.asarray(x)
    sig_var = jnp.mean(x**2)
    noise_var = sig_var / (10 ** (snr_db / 10.0))
    return x + jnp.sqrt(noise_var) * jax.random.normal(key, x.shape, x.dtype)
