"""Numpy-facing metric API (reference: lensless/eval/metric.py).

Single-image metric functions with the reference's normalization
conventions (normalize both images by their max before comparison,
metric.py:119-261), plus ``extract`` — the ROI + rescale helper for
comparing a reconstruction against an original display image
(metric.py:264-331).  LPIPS requires pretrained weights
(eval/lpips.py); it raises a clear error when none are supplied.
"""

from __future__ import annotations

import numpy as np

from ..data.image import resize as _resize
from . import metrics as _jm


def _prep(est, truth, normalize=True):
    est = np.asarray(est, np.float32)
    truth = np.asarray(truth, np.float32)
    if normalize:
        if est.max() > 0:
            est = est / est.max()
        if truth.max() > 0:
            truth = truth / truth.max()
    return est, truth


def mse(true, est, normalize=True):
    """Mean squared error (metric.py:119-144)."""
    est, true = _prep(est, true, normalize)
    return float(np.mean((est - true) ** 2))


def psnr(true, est, normalize=True, data_range=1.0):
    """Peak SNR in dB (metric.py:147-172)."""
    err = mse(true, est, normalize)
    return float(10 * np.log10(data_range**2 / max(err, 1e-20)))


def ssim(true, est, normalize=True, channel_axis=2):
    """Structural similarity (metric.py:175-216); gaussian-window SSIM
    via the jit implementation in eval.metrics."""
    est, true = _prep(est, true, normalize)
    if est.ndim == 2:
        est = est[:, :, None]
        true = true[:, :, None]
    val = _jm.ssim(est[None], true[None])
    return float(np.asarray(val)[0])


def lpips(true, est, normalize=True, lpips_variables=None):
    """LPIPS perceptual distance (metric.py:219-261). Requires params
    converted with eval.lpips.load_torch_lpips."""
    if lpips_variables is None:
        raise RuntimeError(
            "LPIPS needs pretrained VGG weights: convert a torch LPIPS "
            "checkpoint with lenslesspicam_tpu.eval.lpips.load_torch_lpips"
        )
    from .lpips import LPIPS

    est, true = _prep(est, true, normalize)
    model = LPIPS()
    val = model.apply(lpips_variables, est[None], true[None])
    return float(np.asarray(val)[0])


def extract(estimate, original, vertical_crop, horizontal_crop, rotation=0,
            verbose=False):
    """Extract a rotated/cropped region from the reconstruction and
    resize the original to match (metric.py:264-331)."""
    import cv2

    estimate = np.asarray(estimate, np.float32)
    if rotation:
        h, w = estimate.shape[:2]
        mat = cv2.getRotationMatrix2D((w / 2, h / 2), rotation, 1.0)
        estimate = cv2.warpAffine(estimate, mat, (w, h))
    est_roi = estimate[vertical_crop[0]:vertical_crop[1],
                       horizontal_crop[0]:horizontal_crop[1]]

    original = np.asarray(original, np.float32)
    if original.ndim == 2:
        original = original[:, :, None]
    target_shape = est_roi.shape[:2] + (original.shape[-1],)
    orig_resized = _resize(original[None], shape=target_shape)[0]
    if verbose:
        print(f"extracted ROI {est_roi.shape}, original resized {orig_resized.shape}")
    return est_roi, orig_resized
