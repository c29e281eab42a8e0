"""One-shot camera-inversion modules: FlatNet inversion + PhoCoLens
spatially-varying deconvolution.

Re-designs of lensless/recon/trainable_inversion.py:11-50 and
sv_deconvnet.py:13-84, with the standardized camera-inversion signature
``__call__(conv, data, psf)`` shared by all inversion modules.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fft_conv import FFTConvolver


class TrainableInversion(nn.Module):
    """FlatNet-style Wiener-like inversion (trainable_inversion.py:34,49-50):
    deconvolve with ``conj(H) / (||H||_F^2 + K)`` — the global-Frobenius
    rescale of the reference — then clip >= 0.  No parameters of its own;
    trainability comes from surrounding processors / PSF networks."""

    K: float = 1e-4

    @staticmethod
    def make_convolver(psf, dtype=jnp.float32, pad_policy="ref"):
        return FFTConvolver.from_psf(psf, pad=True, norm="ortho", dtype=dtype,
                                     pad_policy=pad_policy)

    @nn.compact
    def __call__(self, conv: FFTConvolver, data: jax.Array, psf=None) -> jax.Array:
        norm_sq = jnp.sum(jnp.abs(conv.H) ** 2)
        # conv.H carries the folded ifftshift mask (real), so conj gives
        # exactly the reference's rescaled Hadj; "convolve" then applies it.
        scaled = conv.with_filter(jnp.conj(conv.H) / (norm_sq + self.K))
        return jnp.maximum(scaled.convolve(data), 0.0)


def compute_weight_matrices(spatial_shape, K: int) -> np.ndarray:
    """Inverse-distance weights to K x K patch centers, normalized to sum
    to 1 per pixel (sv_deconvnet.py:13-39). Returns (K*K, Nx, Ny)."""
    nx, ny = spatial_shape
    centers = [
        (int((i + 0.5) * nx / K), int((j + 0.5) * ny / K))
        for i in range(K)
        for j in range(K)
    ]
    Y, X = np.meshgrid(np.arange(ny), np.arange(nx))
    eps = 1e-4
    weights = np.stack(
        [((X - cx) ** 2 + (Y - cy) ** 2 + eps) ** (-0.5) for cx, cy in centers]
    )
    weights /= weights.sum(axis=0, keepdims=True)
    return weights.astype(np.float32)


class SVDeconvNet(nn.Module):
    """PhoCoLens spatially-varying deconvolution (sv_deconvnet.py:42-84):
    K x K learnable PSF copies deconvolve the measurement; outputs are
    blended with fixed inverse-distance weight maps.

    The K^2 PSF copies are a flax parameter initialized by tiling the
    input PSF (the reference tiles at build time and trains them through
    an external trainable-mask; here they are first-class params —
    set ``learn_multipsf=False`` to reproduce the frozen variant).
    """

    K: int = 3
    learn_multipsf: bool = True
    reg: float = 1e-4

    @nn.compact
    def __call__(self, conv: FFTConvolver, data: jax.Array, psf: jax.Array) -> jax.Array:
        kk = self.K * self.K
        depth, nh, nw, ch = psf.shape

        def init_multipsf(_):
            return jnp.tile(psf, (kk, 1, 1, 1))

        if self.learn_multipsf:
            multipsf = self.param("multipsf", init_multipsf)
        else:
            multipsf = init_multipsf(None)

        weights = jnp.asarray(compute_weight_matrices((nh, nw), self.K))
        weights = weights[None, :, :, :, None]  # (1, K*K, Nx, Ny, 1)

        mconv = FFTConvolver.from_psf(multipsf, pad=True, norm="ortho", dtype=data.dtype)
        # data (B, D, H, W, C) with D==1 -> broadcast over the K*K "depth"
        out = mconv.deconvolve(data)  # (B, K*K, H, W, C)
        out = jnp.sum(weights * out, axis=1, keepdims=True)
        return jnp.maximum(out, 0.0)
