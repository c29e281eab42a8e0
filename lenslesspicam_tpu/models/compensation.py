"""Model-mismatch compensation branch (Zeng & Lam 2021).

Re-design of lensless/recon/utils.py:30-174: a CNN ladder that consumes
the raw measurement plus the K-1 intermediate reconstructions of the
unrolled solver; each rung concatenates a max-pooled residual encoding
of the next intermediate, and the final feature map is concatenated into
the post-processor bottleneck (models/unet.py concatenate_compensation).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class _DoubleConvPool(nn.Module):
    out_ch: int
    pool: int = 2
    skip_last_relu: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_ch, (3, 3), padding=1, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_ch, (3, 3), padding=1, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        if not self.skip_last_relu:
            x = nn.relu(x)
        if self.pool:
            x = nn.max_pool(x, (self.pool, self.pool), strides=(self.pool, self.pool))
        return x


class _ResPool(nn.Module):
    ch: int
    pool: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        r = _DoubleConvPool(self.ch, pool=0, skip_last_relu=True)(x, train)
        x = nn.relu(x + r)
        return nn.max_pool(x, (self.pool, self.pool), strides=(self.pool, self.pool))


class CompensationBranch(nn.Module):
    """``__call__(inputs)`` with ``inputs`` a list of length len(nc):
    [measurement, intermediate_1, ..., intermediate_{K-1}], each
    (B, D, H, W, C); returns the final NHWC feature map (B, h, w, nc[-1])."""

    nc: Sequence[int]
    in_channels: int = 3
    residual: bool = True

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        n_iter = len(self.nc)
        assert len(inputs) == n_iter, "need measurement + n_iter-1 intermediates"

        def to_nhwc(x):
            # (B, D, H, W, C) -> fold depth into channels like convert_to_NCHW
            if x.ndim == 5:
                b, d, h, w, c = x.shape
                return x.transpose(0, 2, 3, 1, 4).reshape(b, h, w, d * c)
            return x

        h = _DoubleConvPool(self.nc[0], name="branch0")(to_nhwc(inputs[0]), train)
        for k in range(n_iter - 1):
            pool = 2 ** (k + 1)
            if self.residual:
                enc = _ResPool(self.in_channels, pool=pool, name=f"res{k}")(
                    to_nhwc(inputs[k + 1]), train
                )
            else:
                enc = _DoubleConvPool(self.nc[k], pool=pool, name=f"res{k}")(
                    to_nhwc(inputs[k + 1]), train
                )
            h = jnp.concatenate([h, enc], axis=-1)
            h = _DoubleConvPool(self.nc[k + 1], name=f"branch{k + 1}")(h, train)
        return h
