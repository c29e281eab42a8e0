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


def stub_wandb():
    """Minimal wandb stub so reference recon/utils.py imports headless."""
    import types

    if "wandb" in sys.modules:
        return
    wb = types.ModuleType("wandb")
    wb.log = lambda *a, **k: None
    wb.init = lambda *a, **k: None
    wb.Image = lambda *a, **k: None
    sys.modules["wandb"] = wb


def stub_reference_train_deps():
    """Stub everything lensless.recon.utils pulls in at import time
    (wandb, hydra, paramiko/pexpect, torchvision.datasets, waveprop,
    perlin_numpy/sympy) so the reference Trainer/create_process_network
    can be imported headless for golden tests."""
    import types

    stub_wandb()
    stub_torchvision()
    stub_reference_mask_deps()

    if "hydra" not in sys.modules:
        hydra = types.ModuleType("hydra")
        hutils = types.ModuleType("hydra.utils")
        hutils.get_original_cwd = lambda: os.getcwd()
        hydra.utils = hutils
        sys.modules["hydra"] = hydra
        sys.modules["hydra.utils"] = hutils

    for name in ("paramiko", "pexpect"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "paramiko":
                mod.SSHClient = object
                mod.AutoAddPolicy = object
                ssh_exc = types.ModuleType("paramiko.ssh_exception")
                for exc in ("AuthenticationException", "BadHostKeyException",
                            "SSHException"):
                    setattr(ssh_exc, exc, type(exc, (Exception,), {}))
                mod.ssh_exception = ssh_exc
                mod.__path__ = []  # mark as package
                sys.modules["paramiko.ssh_exception"] = ssh_exc
            sys.modules[name] = mod

    import importlib.machinery
    import torchvision

    for _name, _mod in list(sys.modules.items()):
        if _mod is not None and getattr(_mod, "__spec__", "x") is None:
            try:
                _mod.__spec__ = importlib.machinery.ModuleSpec(_name, None)
            except (AttributeError, TypeError):
                # C extension modules (e.g. cffi's _openssl) reject setattr
                pass

    if not hasattr(torchvision, "datasets"):
        ds = types.ModuleType("torchvision.datasets")
        sys.modules["torchvision.datasets"] = ds
        torchvision.datasets = ds
    if not hasattr(torchvision.transforms, "ToTensor"):
        torchvision.transforms.ToTensor = object
        torchvision.transforms.Compose = object

    # waveprop entries the simulation/slm modules reference at import
    import waveprop

    for sub, names in (("simulation", ("FarFieldSimulator",)),
                       ("devices", ("SensorParam", "slm_dict", "SLMParam")),
                       ("slm", ("get_centers", "get_slm_mask",
                                "get_active_pixel_dim")),
                       ("spherical", ("spherical_prop",)),
                       ("color", ("ColorFilter",))):
        m = sys.modules.get(f"waveprop.{sub}")
        if m is None:
            m = types.ModuleType(f"waveprop.{sub}")
            sys.modules[f"waveprop.{sub}"] = m
            setattr(waveprop, sub, m)
        for n in names:
            if not hasattr(m, n):
                setattr(m, n, {} if n == "slm_dict" else type(n, (), {}))

    if "torchmetrics" not in sys.modules:
        tm = types.ModuleType("torchmetrics")
        tm.__path__ = []
        tm.StructuralSimilarityIndexMeasure = object
        tm_img = types.ModuleType("torchmetrics.image")
        tm_img.lpip = types.ModuleType("torchmetrics.image.lpip")
        tm_img.lpip.LearnedPerceptualImagePatchSimilarity = object
        tm_img.psnr = types.ModuleType("torchmetrics.image.psnr")
        tm_img.psnr.PeakSignalNoiseRatio = object
        tm.image = tm_img
        sys.modules["torchmetrics"] = tm
        sys.modules["torchmetrics.image"] = tm_img
        sys.modules["torchmetrics.image.lpip"] = tm_img.lpip
        sys.modules["torchmetrics.image.psnr"] = tm_img.psnr

    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")
        dc = types.ModuleType("omegaconf.dictconfig")

        class DictConfig(dict):
            pass

        dc.DictConfig = DictConfig
        oc.dictconfig = dc
        sys.modules["omegaconf"] = oc
        sys.modules["omegaconf.dictconfig"] = dc

    if "slm_controller" not in sys.modules:
        slmc = types.ModuleType("slm_controller")
        slmc.__path__ = []
        hw = types.ModuleType("slm_controller.hardware")

        class SLMParam:  # attribute names used by lensless.hardware.slm
            CELL_SIZE = "cell_size"
            SLM_SHAPE = "slm_shape"
            DEADSPACE = "deadspace"
            COLOR_FILTER = "color_filter"

        hw.SLMParam = SLMParam
        hw.slm_devices = {}
        slmc.hardware = hw
        sys.modules["slm_controller"] = slmc
        sys.modules["slm_controller.hardware"] = hw
