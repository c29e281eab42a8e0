"""Image-quality metrics in JAX — MSE / PSNR / SSIM (+ LPIPS hook).

Mirrors the metric semantics used by the reference benchmark
(lensless/eval/benchmark.py:141-155): torchmetrics MSE (mean), PSNR with
data_range (0,1) computed per image over (D,H,W,C), SSIM with the
standard Wang et al. gaussian window (11x11, sigma 1.5, K1=.01, K2=.03),
and the max-normalization applied to prediction and ground truth before
metric computation (benchmark.py:337-344).

All metrics are pure jnp functions over ``(..., H, W, C)`` batches and
jit/vmap/pjit-compatible, so dataset-scale evaluation runs sharded on the
mesh instead of the reference's one-CPU-thread torchmetrics loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def max_normalize(img: jax.Array, axis=(-1, -2, -3)) -> jax.Array:
    """Divide by per-image max (benchmark.py:337-344)."""
    m = jnp.max(img, axis=axis, keepdims=True)
    return jnp.where(m != 0, img / jnp.where(m == 0, 1.0, m), img)


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Mean squared error over all elements (torchmetrics MSELoss 'mean')."""
    return jnp.mean((pred - target) ** 2)


def psnr(pred: jax.Array, target: jax.Array, data_range: float = 1.0,
         reduce_axes=(-1, -2, -3)) -> jax.Array:
    """Peak SNR in dB, per image over ``reduce_axes`` (benchmark.py:151)."""
    err = jnp.mean((pred - target) ** 2, axis=reduce_axes)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(err, 1e-20))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _filter2d_sep(img: jax.Array, k1d: jax.Array) -> jax.Array:
    """Separable 'valid' gaussian filter over the two spatial axes (-3, -2)
    of an (..., H, W, C) array."""
    size = k1d.shape[0]

    def conv_axis(x, axis):
        x_moved = jnp.moveaxis(x, axis, -1)
        lead_shape = x_moved.shape[:-1]
        n = x_moved.shape[-1]
        flat = x_moved.reshape(-1, 1, n)
        kern = k1d.reshape(1, 1, size)
        out = jax.lax.conv_general_dilated(
            flat, kern, window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "IOH", "NCH"),
        )
        out = out.reshape(lead_shape + (n - size + 1,))
        return jnp.moveaxis(out, -1, axis)

    return conv_axis(conv_axis(img, -3), -2)


def ssim(pred: jax.Array, target: jax.Array, data_range: float = 1.0,
         kernel_size: int = 11, sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03) -> jax.Array:
    """Structural similarity per image (mean over spatial+channels).

    Standard Wang et al. formulation with gaussian window — the
    torchmetrics default used at benchmark.py:153.  Input ``(..., H, W, C)``;
    returns shape ``(...)`` with spatial/channel axes reduced.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    k = jnp.asarray(_gaussian_kernel(kernel_size, sigma))
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = _filter2d_sep(pred, k)
    mu_y = _filter2d_sep(target, k)
    mu_xx = _filter2d_sep(pred * pred, k)
    mu_yy = _filter2d_sep(target * target, k)
    mu_xy = _filter2d_sep(pred * target, k)

    var_x = mu_xx - mu_x**2
    var_y = mu_yy - mu_y**2
    cov = mu_xy - mu_x * mu_y

    ssim_map = ((2 * mu_x * mu_y + c1) * (2 * cov + c2)) / (
        (mu_x**2 + mu_y**2 + c1) * (var_x + var_y + c2)
    )
    return jnp.mean(ssim_map, axis=(-1, -2, -3))


def compute_metrics(pred: jax.Array, target: jax.Array, normalize: bool = True) -> dict:
    """MSE / PSNR / SSIM with the reference's pre-metric normalization.

    ``pred``/``target``: (B, D, H, W, C) or (B, H, W, C); depth collapsed
    into the per-image reduction like the reference (dim=(1,2,3) on NHWC
    after squeezing depth-1).
    """
    if pred.ndim == 5:
        pred = pred[:, 0] if pred.shape[1] == 1 else pred.mean(axis=1)
    if target.ndim == 5:
        target = target[:, 0] if target.shape[1] == 1 else target.mean(axis=1)
    if normalize:
        pred = max_normalize(pred)
        target = max_normalize(target)
    return {
        "MSE": mse(pred, target),
        "PSNR": jnp.mean(psnr(pred, target)),
        "SSIM": jnp.mean(ssim(pred, target)),
    }
