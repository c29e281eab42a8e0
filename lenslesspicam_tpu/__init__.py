"""lenslesspicam_tpu — TPU-native lensless imaging framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
LCAV/LenslessPiCam: classical and learned lensless-camera reconstruction,
mask/PSF simulation, datasets, training, and evaluation — built for TPU
meshes (pjit/shard_map) rather than single-GPU torch.

Public surface mirrors the reference's ``lensless/__init__.py:16-44``.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("LPT_PLATFORM"):
    # reliable platform override: some TPU runtimes pin JAX_PLATFORMS in
    # sitecustomize before user env applies (docs/tpu_runtime_notes.md)
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["LPT_PLATFORM"])
    except Exception:
        pass

from .ops.fft_conv import FFTConvolver, make_convolver  # noqa: F401
from .recon.base import (  # noqa: F401
    ReconstructionAlgorithm,
    ADMM,
    GradientDescent,
    NesterovGradientDescent,
    FISTA,
    apply_admm,
)
from .recon.apgd import APGDPriors  # noqa: F401
from .recon.tikhonov import CodedApertureReconstruction  # noqa: F401
from .hardware.sensor import SensorOptions, VirtualSensor, sensor_dict  # noqa: F401


def __getattr__(name):
    """Lazy exports for the heavier (flax) model layer, mirroring the
    reference's torch-gated re-exports (lensless/__init__.py:16-44)."""
    lazy = {
        "TrainableRecon": ("models.trainable_recon", "TrainableRecon"),
        "TrainableReconstructionAlgorithm": ("models.trainable_recon", "TrainableRecon"),
        "UnrolledADMM": ("models.unrolled", "UnrolledADMM"),
        "UnrolledFISTA": ("models.unrolled", "UnrolledFISTA"),
        "TrainableInversion": ("models.inversion", "TrainableInversion"),
        "SVDeconvNet": ("models.inversion", "SVDeconvNet"),
        "MultiWiener": ("models.multi_wiener", "MultiWiener"),
        "UNetRes": ("models.unet", "UNetRes"),
        "Restormer": ("models.restormer", "Restormer"),
        "APGD": ("recon.apgd", "run"),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(f".{module}", __name__), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
