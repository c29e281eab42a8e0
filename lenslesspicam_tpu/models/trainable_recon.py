"""Modular learned reconstruction: pre-processor -> camera inversion ->
post-processor, with PSF network, background subtraction, and
compensation branch.

Re-design of lensless/recon/trainable_recon.py:22-549 as a single flax
module.  Forward composition mirrors trainable_recon.py:297-405:

1. background handling — direct subtraction + clamp [0,1] (318-322),
   learned subtraction via a background network (323-335), or
   integrated subtraction inside the pre-processor (357-359);
2. PSF network with optional residual, convolver rebuilt from the
   transformed (or per-sample) PSF (338-355);
3. pre-processor with learnable noise-level scalar (357-370);
4. unrolled camera inversion (379-382), optionally collecting
   intermediates for the compensation branch;
5. post-processor, optionally fed the compensation features (389-398);
6. ``return_intermediate`` returns (final, unrolled_out, pre_processed,
   psf) like trainable_recon.py:402-404.

Processor blocks follow get_drunet_function_v2 (recon/utils.py:369-394):
normalize by the global per-sample max, denoise with a noise-level
channel (value/255, apply_denoiser recon/utils.py:247-335), clip >= 0,
rescale.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.fft_conv import FFTConvolver
from .unet import (crop_centered, crop_from_multiple, pad_centered_multiple,
                   pad_to_multiple)


class ProcessorBlock(nn.Module):
    """DruNet-style processor wrapper with a learnable noise level
    (trainable_recon.py:216-219, recon/utils.py:369-394).

    Restormer nets follow the reference's get_restormer_function
    (restormer.py:16-49) instead: no noise channel, no max scaling,
    output clamped to [0, 1].  The unused noise_level param is still
    created for state-dict parity (trainable_recon.py:216-219 creates
    process_param for every processor)."""

    net: nn.Module
    mode: str = "auto"  # "drunet" | "restormer"

    @nn.compact
    def __call__(self, image, background=None, compensation_output=None, train: bool = False):
        noise_level = self.param("noise_level", lambda _: jnp.ones((1,), jnp.float32))
        mode = self.mode
        if mode == "auto":
            mode = ("restormer" if type(self.net).__name__ == "Restormer"
                    else "drunet")
        if mode == "restormer":
            b, d = image.shape[0], image.shape[1]
            x2 = image.reshape((b * d,) + image.shape[2:])
            x2, hw = pad_to_multiple(x2, 8)
            out = self.net(x2)
            out = jnp.clip(out, 0.0, 1.0)
            out = crop_from_multiple(out, hw)
            return out.reshape((b, d) + out.shape[1:])
        x_max = jnp.max(image, axis=(-1, -2, -3, -4), keepdims=True) + 1e-6
        x = image / x_max

        # fold depth into batch for the conv net (convert_to_NCHW analog);
        # centered always-pad like apply_denoiser (recon/utils.py:282-287)
        b, d = x.shape[0], x.shape[1]
        x2 = x.reshape((b * d,) + x.shape[2:])
        x2, hwtl = pad_centered_multiple(x2, 8)
        nl = jnp.broadcast_to(
            jnp.abs(noise_level[0]) / 255.0, x2.shape[:-1] + (1,)
        ).astype(x2.dtype)
        net_in = jnp.concatenate([x2, nl], axis=-1)

        kwargs = {}
        if background is not None:
            bg = background / x_max
            bg2 = bg.reshape((b * d,) + bg.shape[2:])
            bg2, _ = pad_centered_multiple(bg2, 8)
            kwargs["background"] = jnp.concatenate(
                [bg2, jnp.zeros_like(bg2[..., :1])], axis=-1
            )
        if compensation_output is not None:
            kwargs["compensation_output"] = compensation_output
        try:
            out = self.net(net_in, train=train, **kwargs)
        except TypeError:
            out = self.net(net_in, **kwargs)

        out = crop_centered(out, hwtl)
        out = out.reshape((b, d) + out.shape[1:])
        return jnp.clip(out, 0.0, None) * x_max


class TrainableRecon(nn.Module):
    """Composable learned reconstruction (trainable_recon.py:22).

    ``__call__(data, psf, background=None)`` with data (B, D, H, W, C)
    and psf (D, H, W, C) or per-sample (B, D, H, W, C).
    """

    camera_inversion: Optional[nn.Module] = None
    pre_process: Optional[nn.Module] = None
    post_process: Optional[nn.Module] = None
    psf_network: Optional[nn.Module] = None
    background_network: Optional[nn.Module] = None
    compensation_branch: Optional[nn.Module] = None
    psf_residual: bool = True
    direct_background_subtraction: bool = False
    integrated_background_subtraction: bool = False
    skip_unrolled: bool = False
    skip_pre: bool = False
    skip_post: bool = False
    return_intermediate: bool = False
    pad_policy: str = "ref"

    def _make_convolver(self, psf):
        inv = self.camera_inversion
        if inv is not None and hasattr(type(inv), "make_convolver"):
            return type(inv).make_convolver(psf, pad_policy=self.pad_policy)
        return FFTConvolver.from_psf(psf, pad=True, norm="ortho", pad_policy=self.pad_policy)

    @nn.compact
    def __call__(self, data, psf, background=None, train: bool = False):
        assert data.ndim == 5, "batch must be (B, D, H, W, C)"

        # 1. background subtraction (trainable_recon.py:318-335)
        if self.direct_background_subtraction:
            assert background is not None
            data = jnp.clip(data - background, 0.0, 1.0)
        elif self.background_network is not None and not self.integrated_background_subtraction:
            assert background is not None
            bg_est = ProcessorBlock(self.background_network, name="background_block")(
                background, train=train
            )
            data = jnp.clip(data - bg_est, 0.0, 1.0)

        # 2. PSF network + residual; rebuild convolver (338-355)
        if self.psf_network is not None:
            psf5 = psf[None] if psf.ndim == 4 else psf
            psf_out = ProcessorBlock(self.psf_network, name="psf_block")(psf5, train=train)
            psf_out = psf_out[0] if psf.ndim == 4 else psf_out
            psf = psf_out + psf if self.psf_residual else psf_out
        conv = self._make_convolver(psf)

        # 3. pre-process (357-370)
        if self.integrated_background_subtraction:
            assert self.pre_process is not None and background is not None
            data = ProcessorBlock(self.pre_process, name="pre_block")(
                data, background=background, train=train
            )
        elif self.pre_process is not None and not self.skip_pre:
            data = ProcessorBlock(self.pre_process, name="pre_block")(data, train=train)
        pre_processed = data

        # 4. camera inversion (379-382)
        comp_inputs = None
        if self.skip_unrolled or self.camera_inversion is None:
            image_est = data
        elif self.compensation_branch is not None:
            image_est, inters = self.camera_inversion(
                conv, data, psf, return_intermediates=True
            )
            comp_inputs = [data] + inters
        else:
            image_est = self.camera_inversion(conv, data, psf)

        # 5. post-process (389-398)
        if self.post_process is not None and not self.skip_post:
            comp_out = None
            if comp_inputs is not None:
                comp_out = self.compensation_branch(comp_inputs, train=train)
            final_est = ProcessorBlock(self.post_process, name="post_block")(
                image_est, compensation_output=comp_out, train=train
            )
        else:
            final_est = image_est

        if self.return_intermediate:
            return final_est, image_est, pre_processed, psf
        return final_est
