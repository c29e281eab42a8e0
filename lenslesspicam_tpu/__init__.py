"""lenslesspicam_tpu — TPU-native lensless imaging framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
LCAV/LenslessPiCam: classical and learned lensless-camera reconstruction,
mask/PSF simulation, datasets, training, and evaluation — built for TPU
meshes (pjit/shard_map) rather than single-GPU torch.

Public surface mirrors the reference's ``lensless/__init__.py:16-44``.
"""

__version__ = "0.1.0"

from .ops.fft_conv import FFTConvolver, make_convolver  # noqa: F401
from .recon.base import (  # noqa: F401
    ReconstructionAlgorithm,
    ADMM,
    GradientDescent,
    NesterovGradientDescent,
    FISTA,
    apply_admm,
)
