"""Closed-form Tikhonov reconstruction for separable coded-aperture
systems (FlatCam).

Re-design of lensless/recon/tikhonov.py:31-170: measurement model
``Y = P X Q^T``; SVDs of P and Q are precomputed once at construction
(the reference recomputes them per channel per call — identical math,
wasted work), and the analytic inverse

    X = V_L [ (D_L^T U_L^T Y U_R D_R) / (s_L^2 (x) s_R^2 + lambda) ] V_R^T

is applied per channel as one jit-compiled einsum chain — MXU-friendly
batched matmuls, channels vectorized instead of looped.  Output is
clipped non-negative and min-max normalized (tikhonov.py:130-134).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


class CodedApertureReconstruction:
    """Tikhonov solver for ``Y = P X Q^T`` systems."""

    def __init__(self, mask, image_shape, P=None, Q=None, lmbd=3e-4):
        self.lmbd = float(lmbd)
        if P is None or Q is None:
            P, Q = mask.get_conv_matrices(image_shape)
        assert P.shape == (mask.resolution[0], image_shape[0]), "P shape mismatch"
        assert Q.shape == (mask.resolution[1], image_shape[1]), "Q shape mismatch"

        UL, SL, VLh = np.linalg.svd(np.asarray(P, np.float64), full_matrices=True)
        UR, SR, VRh = np.linalg.svd(np.asarray(Q, np.float64), full_matrices=True)
        nL, nR = SL.size, SR.size
        # D^T U^T Y U D == diag(S) @ (U^T Y U)[:n, :n] @ diag(S)
        self.UL = jnp.asarray(UL[:, :nL], jnp.float32)
        self.SL = jnp.asarray(SL, jnp.float32)
        self.VL = jnp.asarray(VLh.T[:, :nL], jnp.float32)
        self.UR = jnp.asarray(UR[:, :nR], jnp.float32)
        self.SR = jnp.asarray(SR, jnp.float32)
        self.VR = jnp.asarray(VRh.T[:, :nR], jnp.float32)

    def apply(self, img):
        """Reconstruct from an (H, W, C) measurement; returns (H', W', C)
        min-max normalized like the reference (tikhonov.py:99-134)."""
        assert img.ndim == 3, "measurement must be (H, W, C)"
        return _tikhonov_apply(
            jnp.asarray(img, jnp.float32), self.UL, self.SL, self.VL,
            self.UR, self.SR, self.VR, self.lmbd,
        )


@jax.jit
def _tikhonov_apply(img, UL, SL, VL, UR, SR, VR, lmbd):
    # move channels first for batched matmuls
    Y = jnp.moveaxis(img, -1, 0)  # (C, H, W)
    core = jnp.einsum("hm,chw,wn->cmn", UL, Y, UR)
    core = SL[None, :, None] * core * SR[None, None, :]
    denom = jnp.outer(SL**2, SR**2) + lmbd
    inner = core / denom[None]
    X = jnp.einsum("hm,cmn,wn->chw", VL, inner, VR)
    X = jnp.moveaxis(X, 0, -1)
    X = jnp.clip(X, 0.0, None)
    return (X - X.min()) / (X.max() - X.min())
