"""UNetRes / DruNet denoiser backbone in flax (NHWC, TPU-native).

Re-design of lensless/recon/drunet/network_unet.py:103-255 (+basicblock
building blocks): 4-scale residual U-Net — head conv, per-scale ``nb``
ResBlocks + stride-2 downsample conv, bottleneck ResBlocks, transposed-
conv upsamples with *additive* skip connections ``m_upK(x + xK)``, tail
conv; all 3x3 convs bias-free like the reference.

Extensions kept at parity:

* optional background-subtraction branch: a parallel encoder whose
  per-scale features are subtracted with learnable scalar weights
  (network_unet.py:149-176, 226-238);
* optional compensation-branch concat at the bottleneck
  (network_unet.py:178-192, 240-244);
* plain ``UNet`` variant with a global residual (network_unet.py:22-100).

DruNet = UNetRes(in_nc=4) operating on RGB + a noise-level channel
(recon/utils.py:230-238); see ``drunet_denoise`` below.

Layout note: the reference is NCHW torch; here everything is NHWC, the
native layout for TPU convolutions (lane dimension = channels).
Pretrained torch checkpoints can be converted by transposing conv
kernels (O,I,H,W) -> (H,W,I,O); see zoo/convert.py.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ResBlock(nn.Module):
    """x + conv3x3(relu(conv3x3(x))) — basicblock.py ResBlock 'CRC'."""

    ch: int

    @nn.compact
    def __call__(self, x):
        r = nn.Conv(self.ch, (3, 3), padding=1, use_bias=False, name="conv1")(x)
        r = nn.relu(r)
        r = nn.Conv(self.ch, (3, 3), padding=1, use_bias=False, name="conv2")(r)
        return x + r


class _Encoder(nn.Module):
    """head conv + 3 down stages; returns (x1, x2, x3, x4)."""

    nc: Sequence[int]
    nb: int

    @nn.compact
    def __call__(self, x):
        nc = self.nc
        x1 = nn.Conv(nc[0], (3, 3), padding=1, use_bias=False, name="head")(x)
        h = x1
        feats = [x1]
        for scale in range(3):
            for j in range(self.nb):
                h = ResBlock(nc[scale], name=f"down{scale}_res{j}")(h)
            h = nn.Conv(nc[scale + 1], (2, 2), strides=(2, 2), padding=0,
                        use_bias=False, name=f"down{scale}_conv")(h)
            feats.append(h)
        return feats  # [x1, x2, x3, x4]


class UNetRes(nn.Module):
    """4-scale residual U-Net (network_unet.py:103-255)."""

    out_nc: int = 3
    nc: Sequence[int] = (64, 128, 256, 512)
    nb: int = 4
    background_subtraction: bool = False
    concatenate_compensation: bool = False

    @nn.compact
    def __call__(self, x0, background=None, compensation_output=None):
        nc = self.nc
        assert len(nc) == 4, "nc must have 4 scales"
        x1, x2, x3, x4 = _Encoder(nc, self.nb, name="encoder")(x0)

        if self.background_subtraction:
            assert background is not None, "background required"
            b1, b2, b3, b4 = _Encoder(nc, self.nb, name="encoder_background")(background)
            w = self.param("subtraction_weights", nn.initializers.ones, (4,))
            x1 = x1 - w[0] * b1
            x2 = x2 - w[1] * b2
            x3 = x3 - w[2] * b3
            x4 = x4 - w[3] * b4

        latent = x4
        if self.concatenate_compensation:
            assert compensation_output is not None, "compensation_output required"
            comp = jax.image.resize(
                compensation_output,
                compensation_output.shape[:-3] + x4.shape[-3:-1] + compensation_output.shape[-1:],
                method="bilinear",
            )
            latent = jnp.concatenate([x4, comp], axis=-1)
            latent = nn.relu(
                nn.Conv(nc[3], (3, 3), padding=1, use_bias=False,
                        name="body_concat_conv")(latent)
            )

        h = latent
        for j in range(self.nb):
            h = ResBlock(nc[3], name=f"body_res{j}")(h)

        # m_up3(x + x4), m_up2(x + x3), m_up1(x + x2), m_tail(x + x1)
        for scale, skip in ((2, x4), (1, x3), (0, x2)):
            h = nn.ConvTranspose(nc[scale], (2, 2), strides=(2, 2), padding="VALID",
                                 use_bias=False, name=f"up{scale}_conv")(h + skip)
            for j in range(self.nb):
                h = ResBlock(nc[scale], name=f"up{scale}_res{j}")(h)

        return nn.Conv(self.out_nc, (3, 3), padding=1, use_bias=False,
                       name="tail")(h + x1)


class UNet(nn.Module):
    """Plain U-Net with global residual ``+ x0`` (network_unet.py:22-100).

    Structure matches the reference exactly (so its checkpoints convert):
    biased conv+ReLU head, per-scale ``nb`` conv+ReLU blocks + stride-2
    down conv (all biased), ``nb + 1`` body convs, transposed-conv
    upsamples with additive skips, biased tail conv, global residual."""

    out_nc: int = 3
    nc: Sequence[int] = (64, 128, 256, 512)
    nb: int = 2

    @nn.compact
    def __call__(self, x0):
        nc = self.nc
        x1 = nn.relu(nn.Conv(nc[0], (3, 3), padding=1, name="head")(x0))
        h = x1
        skips = [x1]
        for scale in range(3):
            for j in range(self.nb):
                h = nn.relu(nn.Conv(nc[scale], (3, 3), padding=1,
                                    name=f"down{scale}_conv{j}")(h))
            h = nn.relu(nn.Conv(nc[scale + 1], (2, 2), strides=(2, 2), padding=0,
                                name=f"down{scale}_down")(h))
            skips.append(h)
        x1, x2, x3, x4 = skips
        for j in range(self.nb + 1):
            h = nn.relu(nn.Conv(nc[3], (3, 3), padding=1, name=f"body_conv{j}")(h))
        for scale, skip in ((2, x4), (1, x3), (0, x2)):
            h = nn.relu(nn.ConvTranspose(nc[scale], (2, 2), strides=(2, 2),
                                         padding="VALID", name=f"up{scale}_up")(h + skip))
            for j in range(self.nb):
                h = nn.relu(nn.Conv(nc[scale], (3, 3), padding=1,
                                    name=f"up{scale}_conv{j}")(h))
        out = nn.Conv(self.out_nc, (3, 3), padding=1, name="tail")(h + x1)
        # reference adds the raw input (assumes in_nc == out_nc); guard
        # the channel mismatch the torch version would error on
        residual = x0[..., : self.out_nc] if x0.shape[-1] >= self.out_nc else x0
        return out + residual


def pad_to_multiple(x: jax.Array, mult: int = 8):
    """Zero-pad spatial dims (-3, -2) up to a multiple, bottom-right
    anchored, no-op when aligned — the RESTORMER pad semantics
    (recon/restormer.py:25-34); returns (padded, (h, w)) for cropping."""
    h, w = x.shape[-3], x.shape[-2]
    ph = (-h) % mult
    pw = (-w) % mult
    cfg = [(0, 0)] * x.ndim
    cfg[-3] = (0, ph)
    cfg[-2] = (0, pw)
    return jnp.pad(x, cfg), (h, w)


def crop_from_multiple(x: jax.Array, hw):
    h, w = hw
    return x[..., :h, :w, :]


def pad_centered_multiple(x: jax.Array, mult: int = 8):
    """The DRUNET pad semantics (recon/utils.py apply_denoiser:282-287):
    pad = mult - dim % mult (so a full ``mult`` even when aligned),
    split centered.  Returns (padded, (h, w, top, left))."""
    h, w = x.shape[-3], x.shape[-2]
    ph = mult - h % mult
    pw = mult - w % mult
    top, left = ph // 2, pw // 2
    cfg = [(0, 0)] * x.ndim
    cfg[-3] = (top, ph - top)
    cfg[-2] = (left, pw - left)
    return jnp.pad(x, cfg), (h, w, top, left)


def crop_centered(x: jax.Array, hwtl):
    h, w, top, left = hwtl
    return x[..., top : top + h, left : left + w, :]


def drunet_denoise(model: UNetRes, params, image: jax.Array, noise_level: float | jax.Array):
    """DruNet-style denoising: concat a constant noise-level channel
    (scaled /255 like recon/utils.py:230-238), centered pad to x8
    (apply_denoiser:282-287), run, crop."""
    x, hwtl = pad_centered_multiple(image, 8)
    nl = jnp.broadcast_to(jnp.asarray(noise_level, x.dtype) / 255.0, x.shape[:-1] + (1,))
    out = model.apply(params, jnp.concatenate([x, nl], axis=-1))
    return crop_centered(out, hwtl)


def load_drunet(path, nc=(64, 128, 256, 512), nb=4):
    """Load a pretrained DruNet color denoiser from a DPIR torch
    checkpoint (recon/utils.py:191-244 analog; the 130 MB
    drunet_color.pth must be downloaded separately — no egress here).

    Returns (UNetRes model, flax variables); use with drunet_denoise.
    """
    import torch

    from ..zoo.convert import torch_unetres_to_flax

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    variables = torch_unetres_to_flax(sd, nb=nb)
    model = UNetRes(out_nc=3, nc=tuple(nc), nb=nb)
    return model, variables
