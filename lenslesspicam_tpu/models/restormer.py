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
  with 1x1 reductions (levels 3 and 2 only, like the reference — the
  level-1 decoder runs at 2*dim on the raw concat), refinement blocks,
  and a global residual.

Structure and numerics match the reference exactly so that published
torch checkpoints convert (zoo/convert.torch_restormer_to_flax):
BiasFree layernorm does NOT subtract the mean (restormer.py:64-78),
GDFN gates gelu(chunk1) * chunk2 (restormer.py:136-142), and the
pixel-(un)shuffle channel order is torch's (c, i, j).

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
    """Channel layernorm over NHWC features matching the reference's
    two variants (restormer.py:64-112): BiasFree (use_bias=False, the
    processor default) scales by 1/std WITHOUT subtracting the mean;
    WithBias is a standard layernorm.  Both use eps=1e-5 inside sqrt."""

    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        weight = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(var + 1e-5)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
            return (x - mu) * inv * weight + bias
        return x * inv * weight


def pixel_unshuffle(x, factor=2):
    """torch.nn.PixelUnshuffle in NHWC: output channel c*f*f + i*f + j
    holds input channel c at spatial offset (i, j)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    return x.transpose(0, 1, 3, 5, 2, 4).reshape(b, h // factor, w // factor,
                                                 c * factor * factor)


def pixel_shuffle(x, factor=2):
    """torch.nn.PixelShuffle in NHWC (inverse channel order of
    pixel_unshuffle)."""
    b, h, w, c = x.shape
    co = c // (factor * factor)
    x = x.reshape(b, h, w, co, factor, factor)
    return x.transpose(0, 1, 4, 2, 5, 3).reshape(b, h * factor, w * factor, co)


class MDTA(nn.Module):
    """Multi-dconv-head transposed attention (restormer.py:145-183)."""

    dim: int
    num_heads: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        temperature = self.param("temperature", nn.initializers.ones,
                                 (self.num_heads, 1, 1))
        qkv = nn.Conv(self.dim * 3, (1, 1), use_bias=self.use_bias,
                      name="qkv")(x)
        qkv = nn.Conv(self.dim * 3, (3, 3), padding=1,
                      feature_group_count=self.dim * 3,
                      use_bias=self.use_bias, name="qkv_dwconv")(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            # (B, H, W, C) -> (B, heads, C/heads, H*W)
            t = t.reshape(b, h * w, self.num_heads, c // self.num_heads)
            return t.transpose(0, 2, 3, 1)

        q, k, v = heads(q), heads(k), heads(v)
        # F.normalize(dim=-1): eps 1e-12 clamped norm
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        attn = jnp.einsum("bhcn,bhdn->bhcd", q, k) * temperature
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhcd,bhdn->bhcn", attn, v)
        out = out.transpose(0, 3, 1, 2).reshape(b, h, w, c)
        return nn.Conv(self.dim, (1, 1), use_bias=self.use_bias,
                       name="project_out")(out)


class GDFN(nn.Module):
    """Gated depthwise-conv feed-forward (restormer.py:115-142):
    out = project_out(gelu(chunk1) * chunk2)."""

    dim: int
    expansion: float = 2.66
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.expansion)
        x = nn.Conv(hidden * 2, (1, 1), use_bias=self.use_bias,
                    name="project_in")(x)
        x = nn.Conv(hidden * 2, (3, 3), padding=1,
                    feature_group_count=hidden * 2, use_bias=self.use_bias,
                    name="dwconv")(x)
        x1, x2 = jnp.split(x, 2, axis=-1)
        return nn.Conv(self.dim, (1, 1), use_bias=self.use_bias,
                       name="project_out")(nn.gelu(x1) * x2)


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int
    expansion: float = 2.66
    ln_bias: bool = False

    @nn.compact
    def __call__(self, x):
        x = x + MDTA(self.dim, self.num_heads,
                     name="attn")(LayerNorm2d(self.ln_bias, name="norm1")(x))
        x = x + GDFN(self.dim, self.expansion,
                     name="ffn")(LayerNorm2d(self.ln_bias, name="norm2")(x))
        return x


class Restormer(nn.Module):
    """4-level Restormer (restormer.py:246-431), reference structure:
    encoder levels at (d, 2d, 4d), latent at 8d, decoder with 1x1
    channel reductions at levels 3 and 2, level-1 decoder + refinement
    at 2d, biased-free 3x3 tail with a global residual."""

    out_channels: int = 3
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement_blocks: int = 4
    heads: Sequence[int] = (1, 2, 4, 8)
    expansion: float = 2.66
    ln_bias: bool = False  # reference processors use BiasFree

    @nn.compact
    def __call__(self, x):
        inp = x
        d = self.dim
        dims = [d, d * 2, d * 4, d * 8]

        def blocks(f, level_dim, level_heads, n, name):
            for i in range(n):
                f = TransformerBlock(level_dim, level_heads, self.expansion,
                                     self.ln_bias, name=f"{name}_{i}")(f)
            return f

        f = nn.Conv(d, (3, 3), padding=1, use_bias=False,
                    name="patch_embed")(x)

        enc1 = blocks(f, dims[0], self.heads[0], self.num_blocks[0],
                      "encoder_level1")
        f = pixel_unshuffle(nn.Conv(dims[0] // 2, (3, 3), padding=1,
                                    use_bias=False, name="down1_2")(enc1))
        enc2 = blocks(f, dims[1], self.heads[1], self.num_blocks[1],
                      "encoder_level2")
        f = pixel_unshuffle(nn.Conv(dims[1] // 2, (3, 3), padding=1,
                                    use_bias=False, name="down2_3")(enc2))
        enc3 = blocks(f, dims[2], self.heads[2], self.num_blocks[2],
                      "encoder_level3")
        f = pixel_unshuffle(nn.Conv(dims[2] // 2, (3, 3), padding=1,
                                    use_bias=False, name="down3_4")(enc3))
        f = blocks(f, dims[3], self.heads[3], self.num_blocks[3], "latent")

        f = pixel_shuffle(nn.Conv(dims[3] * 2, (3, 3), padding=1,
                                  use_bias=False, name="up4_3")(f))
        f = jnp.concatenate([f, enc3], axis=-1)
        f = nn.Conv(dims[2], (1, 1), use_bias=False,
                    name="reduce_chan_level3")(f)
        f = blocks(f, dims[2], self.heads[2], self.num_blocks[2],
                   "decoder_level3")

        f = pixel_shuffle(nn.Conv(dims[2] * 2, (3, 3), padding=1,
                                  use_bias=False, name="up3_2")(f))
        f = jnp.concatenate([f, enc2], axis=-1)
        f = nn.Conv(dims[1], (1, 1), use_bias=False,
                    name="reduce_chan_level2")(f)
        f = blocks(f, dims[1], self.heads[1], self.num_blocks[1],
                   "decoder_level2")

        f = pixel_shuffle(nn.Conv(dims[1] * 2, (3, 3), padding=1,
                                  use_bias=False, name="up2_1")(f))
        f = jnp.concatenate([f, enc1], axis=-1)
        # no channel reduction at level 1 (restormer.py:352-369): the
        # level-1 decoder and refinement run at 2*dim
        f = blocks(f, dims[1], self.heads[0], self.num_blocks[0],
                   "decoder_level1")
        f = blocks(f, dims[1], self.heads[0], self.num_refinement_blocks,
                   "refinement")

        out = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                      name="output")(f)
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
