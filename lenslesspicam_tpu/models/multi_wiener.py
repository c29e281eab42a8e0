"""MultiWiener deconvolution network (MWDN) in flax.

Re-design of lensless/recon/multi_wiener.py:18-296: U-Net encoder with a
parallel PSF encoder branch; at each scale the image features are
Wiener-filtered by the PSF features with a learnable regularizer
``delta`` per scale and a learnable PSF gain ``w``; bilinear-upsample
decoder with concatenation skips; inputs padded to a multiple of 8;
output mapped ``(x + 1) / 2`` then clipped (multi_wiener.py:255-257).

NHWC layout; BatchNorm carries ``batch_stats`` (pass ``train=True`` and
``mutable=["batch_stats"]`` during training).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class DoubleConv(nn.Module):
    out_ch: int
    mid_ch: int | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.mid_ch or self.out_ch
        x = nn.Conv(mid, (3, 3), padding=1, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_ch, (3, 3), padding=1, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        return nn.relu(x)


class Down(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return DoubleConv(self.out_ch)(x, train)


def bilinear_align_corners(x, out_h: int, out_w: int):
    """Bilinear resize with align_corners=True semantics (matches
    torch ``nn.Upsample(mode='bilinear', align_corners=True)`` used by
    the reference's ``Up``, multi_wiener.py:54-57): output sample ``i``
    reads input coordinate ``i * (n_in - 1) / (n_out - 1)``."""
    h, w = x.shape[-3], x.shape[-2]

    def axis_coords(n_in, n_out):
        if n_out == 1:
            return jnp.zeros((1,), x.dtype)
        return jnp.linspace(0.0, n_in - 1.0, n_out).astype(x.dtype)

    ys = axis_coords(h, out_h)
    xs = axis_coords(w, out_w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0.astype(x.dtype))[:, None, None]
    wx = (xs - x0.astype(x.dtype))[:, None]

    rows = (1 - wy) * jnp.take(x, y0, axis=-3) + wy * jnp.take(x, y1, axis=-3)
    return (1 - wx) * jnp.take(rows, x0, axis=-2) + wx * jnp.take(rows, x1, axis=-2)


class Up(nn.Module):
    out_ch: int
    mid_ch: int | None = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        x1 = bilinear_align_corners(x1, x1.shape[-3] * 2, x1.shape[-2] * 2)
        dy = x2.shape[-3] - x1.shape[-3]
        dx = x2.shape[-2] - x1.shape[-2]
        cfg = [(0, 0)] * x1.ndim
        cfg[-3] = (dy // 2, dy - dy // 2)
        cfg[-2] = (dx // 2, dx - dx // 2)
        x1 = jnp.pad(x1, cfg)
        x = jnp.concatenate([x2, x1], axis=-1)
        return DoubleConv(self.out_ch, self.mid_ch)(x, train)


def wiener_filter(blur, psf_feat, delta):
    """Per-feature-channel Wiener deconvolution (multi_wiener.py WieNer):
    irfft2(conj(P)/(|P|^2 + delta) * rfft2(blur)) + ifftshift."""
    h, w = blur.shape[-3], blur.shape[-2]
    blur_fft = jnp.fft.rfft2(blur, axes=(-3, -2))
    psf_fft = jnp.fft.rfft2(psf_feat, axes=(-3, -2))
    filt = jnp.conj(psf_fft) / (jnp.abs(psf_fft) ** 2 + delta)
    img = jnp.fft.irfft2(filt * blur_fft, s=(h, w), axes=(-3, -2))
    return jnp.roll(img, (-(h // 2), -(w // 2)), axis=(-3, -2))


class MultiWiener(nn.Module):
    """``__call__(data, psf)``: data (B, D, H, W, C) with D == 1,
    psf (D, H, W, psf_channels); returns same-shaped reconstruction."""

    in_channels: int = 3
    out_channels: int = 3
    psf_channels: int = 1
    nc: Sequence[int] = (64, 128, 256, 512, 512)

    @nn.compact
    def __call__(self, data: jax.Array, psf: jax.Array, train: bool = False) -> jax.Array:
        nc = self.nc
        if data.ndim == 5:
            assert data.shape[1] == 1, "3D not supported (multi_wiener.py:217)"
            x = data[:, 0]
        else:
            x = data
        h0, w0 = x.shape[-3], x.shape[-2]
        pt = (8 - h0 % 8) // 2
        pb = (8 - h0 % 8) - pt
        pl = (8 - w0 % 8) // 2
        pr = (8 - w0 % 8) - pl
        x = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
        psf_in = jnp.pad(psf[0] if psf.ndim == 4 else psf, ((pt, pb), (pl, pr), (0, 0)))[None]

        delta = self.param("delta", lambda _: jnp.ones((len(nc),), jnp.float32) * 0.01)
        w_gain = self.param("w", lambda _: jnp.ones((1, 1, 1, self.psf_channels), jnp.float32) * 0.001)

        # encoder
        feats = [DoubleConv(nc[0], name="inc")(x, train)]
        for i in range(len(nc) - 1):
            feats.append(Down(nc[i + 1], name=f"down{i}")(feats[-1], train))

        # PSF branch (one fewer downsample than image branch, multi_wiener.py:146-148)
        psf_feats = [DoubleConv(nc[0], name="inc0")(w_gain * psf_in, train)]
        for i in range(len(nc) - 2):
            psf_feats.append(Down(nc[i + 1], name=f"psf_down{i}")(psf_feats[-1], train))

        for i in range(len(psf_feats)):
            feats[i] = wiener_filter(feats[i], psf_feats[i], delta[i])

        # decoder with concat skips
        n_prev = nc[-1]
        h = feats[-1]
        for i in range(len(nc) - 1):
            n_out = nc[-i - 2] // 2 if i < len(nc) - 2 else nc[0]
            h = Up(n_out, (n_prev + nc[-i - 2]) // 2, name=f"up{i}")(h, feats[-i - 2], train)
            n_prev = n_out
        out = nn.Conv(self.out_channels, (1, 1), name="outc")(h)

        out = out[..., pt : pt + h0, pl : pl + w0, :]
        out = (out + 1.0) / 2.0
        out = jnp.clip(out, 0.0, None)
        return out[:, None] if data.ndim == 5 else out
