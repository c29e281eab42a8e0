"""Restormer — transformer-based restoration model (Zamir et al. 2022).

Re-design of lensless/recon/restormer.py (which adapts the public
Restormer repo) in flax/NHWC: 4-level encoder-decoder of transformer
blocks with

* MDTA — multi-dconv-head *transposed* attention: attention computed
  across the channel dimension (C x C attention matrix), with 3x3
  depthwise convs on q/k/v — linear in pixels, so it scales to large
  images (the reason Restormer suits restoration);
* GDFN — gated depthwise-conv feed-forward network;
* pixel-unshuffle downsampling / pixel-shuffle upsampling, concat skips
  with 1x1 reductions, refinement blocks, and a global residual.

``restormer_fn`` wraps the model with the reference's processor
interface: NDHWC <-> net layout + pad-to-multiple-of-8
(restormer.py:16-49 get_restormer_function).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class LayerNorm2d(nn.Module):
    """Channel LayerNorm over NHWC features (bias-free variant)."""

    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(use_bias=self.use_bias)(x)


def pixel_unshuffle(x, factor=2):
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // factor, w // factor,
                                                 c * factor * factor)


def pixel_shuffle(x, factor=2):
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, factor, factor, c // (factor * factor))
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * factor, w * factor,
                                                 c // (factor * factor))


class MDTA(nn.Module):
    """Multi-dconv-head transposed attention (channel attention)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        temperature = self.param("temperature", nn.initializers.ones, (self.num_heads, 1, 1))
        qkv = nn.Conv(self.dim * 3, (1, 1), use_bias=False)(x)
        qkv = nn.Conv(self.dim * 3, (3, 3), padding=1, feature_group_count=self.dim * 3,
                      use_bias=False)(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            # (B, H, W, C) -> (B, heads, C/heads, H*W)
            t = t.reshape(b, h * w, self.num_heads, c // self.num_heads)
            return t.transpose(0, 2, 3, 1)

        q, k, v = heads(q), heads(k), heads(v)
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-8)
        k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-8)
        attn = jnp.einsum("bhcn,bhdn->bhcd", q, k) * temperature
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhcd,bhdn->bhcn", attn, v)
        out = out.transpose(0, 3, 1, 2).reshape(b, h, w, c)
        return nn.Conv(self.dim, (1, 1), use_bias=False)(out)


class GDFN(nn.Module):
    """Gated depthwise-conv feed-forward."""

    dim: int
    expansion: float = 2.66

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.expansion)
        x = nn.Conv(hidden * 2, (1, 1), use_bias=False)(x)
        x = nn.Conv(hidden * 2, (3, 3), padding=1, feature_group_count=hidden * 2,
                    use_bias=False)(x)
        a, g = jnp.split(x, 2, axis=-1)
        return nn.Conv(self.dim, (1, 1), use_bias=False)(nn.gelu(g) * a)


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        x = x + MDTA(self.dim, self.num_heads)(LayerNorm2d()(x))
        x = x + GDFN(self.dim)(LayerNorm2d()(x))
        return x


class Restormer(nn.Module):
    """4-level Restormer (restormer.py Restormer class)."""

    out_channels: int = 3
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement_blocks: int = 4
    heads: Sequence[int] = (1, 2, 4, 8)

    @nn.compact
    def __call__(self, x):
        inp = x
        d = self.dim
        f = nn.Conv(d, (3, 3), padding=1, use_bias=False)(x)  # patch embed

        # encoder
        skips = []
        dims = [d, d * 2, d * 4, d * 8]
        for level in range(4):
            for _ in range(self.num_blocks[level]):
                f = TransformerBlock(dims[level], self.heads[level])(f)
            if level < 3:
                skips.append(f)
                # downsample: conv to half channels + pixel-unshuffle (x4 ch)
                f = nn.Conv(dims[level] // 2, (3, 3), padding=1, use_bias=False)(f)
                f = pixel_unshuffle(f, 2)

        # decoder
        for level in (2, 1, 0):
            f = nn.Conv(f.shape[-1] * 2, (3, 3), padding=1, use_bias=False)(f)
            f = pixel_shuffle(f, 2)
            f = jnp.concatenate([f, skips[level]], axis=-1)
            target = dims[level] if level > 0 else dims[1]  # level-0 keeps 2*dim
            f = nn.Conv(target, (1, 1), use_bias=False)(f)
            for _ in range(self.num_blocks[level]):
                f = TransformerBlock(target, self.heads[level])(f)

        for _ in range(self.num_refinement_blocks):
            f = TransformerBlock(dims[1], self.heads[0])(f)

        out = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False)(f)
        return out + inp[..., : self.out_channels]


def restormer_fn(model: Restormer, variables):
    """Processor wrapper: NDHWC in/out + pad-to-8 (restormer.py:16-49)."""
    from .unet import crop_from_multiple, pad_to_multiple

    def process(image, noise_level=None, **_ignored):
        b, depth = image.shape[0], image.shape[1]
        x = image.reshape((b * depth,) + image.shape[2:])
        x, hw = pad_to_multiple(x, 8)
        out = model.apply(variables, x)
        out = crop_from_multiple(out, hw)
        return out.reshape((b, depth) + out.shape[1:])

    return process
