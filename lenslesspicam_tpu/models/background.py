"""Integrated background subtraction network.

Re-design of lensless/recon/integrated_background_sub.py:99-242: a U-Net
that performs background subtraction *inside* the network — a parallel
encoder processes the background measurement and its per-scale features
are subtracted from the image features with learnable scalar weights
before decoding.  Used as a pre-processor replacement
(trainable_recon.py:135-142, 357-359).

Our UNetRes already implements the per-scale encoder-subtraction
(models/unet.py, network_unet.py:149-176); this module packages it with
the processor-block interface that receives the background through the
``background`` argument.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
from .unet import UNetRes


class IntegratedBackgroundSub(nn.Module):
    """``__call__(x, background)`` with NHWC inputs carrying the
    noise-level channel appended by ProcessorBlock."""

    out_nc: int = 3
    nc: Sequence[int] = (32, 64, 112, 128)
    nb: int = 2

    input_background: bool = True  # signals TrainableRecon to pass background

    @nn.compact
    def __call__(self, x, background=None, train: bool = False):
        assert background is not None, "IntegratedBackgroundSub needs a background"
        return UNetRes(
            out_nc=self.out_nc, nc=self.nc, nb=self.nb,
            background_subtraction=True, name="unet",
        )(x, background=background)
