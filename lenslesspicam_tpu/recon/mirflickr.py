"""DiffuserCam-MirFlickr-specific ADMM (reference:
lensless/recon/mirflickr.py:14-42).

Legacy convenience class: same ADMM solver with the dataset's
post-processing — BGR -> RGB channel swap, vertical flip, and crop to
the region used by the Waller-Lab LenslessLearning benchmark.
"""

from __future__ import annotations

import numpy as np

from .base import ADMM


def postprocess(image: np.ndarray) -> np.ndarray:
    """BGR->RGB, flipud, clip, crop (mirflickr.py:37-42)."""
    image = np.asarray(image, np.float32)
    image_color = image[..., ::-1]  # BGR -> RGB
    out = np.flipud(np.clip(image_color, 0, 1))
    return out[60:, 62:-38, :]


class ADMM_MIRFLICKR(ADMM):
    """ADMM with MirFlickr post-processing applied to the output."""

    def apply(self, n_iter=None, **kwargs):
        res = np.asarray(super().apply(n_iter=n_iter, **kwargs))
        assert res.shape[0] == 1, "expects 2-D reconstruction"
        return postprocess(res[0])
