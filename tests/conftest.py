"""Test config: run on a virtual 8-device CPU mesh (no TPU dependency).

Environment must be set before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session default (axon TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Reference implementation (oracle for golden tests); optional.
REFERENCE_PATH = "/root/reference"


def reference_available():
    return os.path.isdir(os.path.join(REFERENCE_PATH, "lensless"))


def add_reference_to_path():
    if REFERENCE_PATH not in sys.path:
        sys.path.append(REFERENCE_PATH)


def stub_torchvision():
    """Minimal torchvision stub (resize/rotate) for reference modules."""
    import types

    if "torchvision" in sys.modules:
        return
    import torch

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")

    def _resize(img, size, **kwargs):
        return torch.nn.functional.interpolate(
            img if img.ndim == 4 else img[None], size=tuple(size),
            mode="bilinear", align_corners=False,
        ) if img.ndim == 4 else torch.nn.functional.interpolate(
            img[None], size=tuple(size), mode="bilinear", align_corners=False
        )[0]

    functional.resize = _resize
    transforms.functional = functional
    tv.transforms = transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = functional


def stub_reference_mask_deps():
    """Stub the reference mask.py's optional deps (perlin_numpy, sympy,
    waveprop) so pattern-generation code paths import; propagation paths
    are NOT stubbed faithfully — only use for pattern golden tests."""
    import types

    import numpy as np

    if "perlin_numpy" not in sys.modules:
        from lenslesspicam_tpu.hardware.mask import perlin_noise_2d

        mod = types.ModuleType("perlin_numpy")
        mod.generate_perlin_noise_2d = lambda shape, res: perlin_noise_2d(shape, res)
        sys.modules["perlin_numpy"] = mod
    try:
        import sympy  # noqa: F401
    except ImportError:
        from lenslesspicam_tpu.hardware.mask import quadratic_residues

        sympy = types.ModuleType("sympy")
        ntheory = types.ModuleType("sympy.ntheory")
        ntheory.quadratic_residues = quadratic_residues
        sympy.ntheory = ntheory
        sys.modules["sympy"] = sympy
        sys.modules["sympy.ntheory"] = ntheory
    if "waveprop" not in sys.modules:
        waveprop = types.ModuleType("waveprop")
        sys.modules["waveprop"] = waveprop
        for sub in ("fresnel", "rs", "noise", "simulation", "slm", "spherical", "devices"):
            m = types.ModuleType(f"waveprop.{sub}")
            sys.modules[f"waveprop.{sub}"] = m
            setattr(waveprop, sub, m)
        waveprop.fresnel.fresnel_conv = None
        waveprop.rs.angular_spectrum = None
        waveprop.noise.add_shot_noise = None
