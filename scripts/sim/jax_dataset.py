"""Propagate a framework dataset through the simulator with batching.

JAX-native analog of the reference's torch_dataset.py /
torch_custom_dataset.py: wrap a torchvision dataset (mnist /
fashion_mnist / cifar10 — download-gated offline) or a directory of
images in :class:`SimulatedFarFieldDataset`, iterate batches through
the jit convolution, and report the time per batch.

Example:
    python scripts/sim/jax_dataset.py files.dataset=<dir>  # custom dir
    python scripts/sim/jax_dataset.py files.dataset=mnist  # torchvision
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from lenslesspicam_tpu.utils.config import config_main

_DEFAULTS = {
    "files": {"dataset": None, "psf": None, "n_files": 16,
              "batch_size": 4, "image_ext": "png"},
    "simulation": {
        "object_height": 0.3,
        "scene2mask": 0.25,
        "mask2sensor": 0.004,
        "sensor": "rpi_hq",
        "snr_db": 40,
        "downsample": 8,
        "grayscale": False,
        "max_val": 255,
    },
    "output_dir": "outputs",
}


def _fill(config, defaults):
    for k, v in defaults.items():
        if isinstance(v, dict):
            config.setdefault(k, {})
            _fill(config[k], v)
        else:
            config.setdefault(k, v)


class _DirImages:
    """Directory of images as an indexable dataset (the reference's
    torch_custom_dataset analog)."""

    def __init__(self, root, ext, n_files=None, grayscale=False):
        from lenslesspicam_tpu.data.io import load_image

        self._load = load_image
        self.files = sorted(glob.glob(os.path.join(root, f"*.{ext}")))
        if n_files:
            self.files = self.files[: int(n_files)]
        self.grayscale = grayscale

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx):
        from lenslesspicam_tpu.data.image import rgb2gray

        img = self._load(self.files[idx]).astype(np.float32) / 255.0
        if self.grayscale and img.ndim == 3:
            img = np.asarray(rgb2gray(img[None]))[0]
        return img


@config_main(None)
def simulate(config):
    _fill(config, _DEFAULTS)
    from lenslesspicam_tpu.data.datasets import SimulatedFarFieldDataset
    from lenslesspicam_tpu.data.image import rgb2gray
    from lenslesspicam_tpu.data.io import load_psf
    from lenslesspicam_tpu.data.simulation import FarFieldSimulator

    files_cfg = config["files"]
    sim_cfg = config["simulation"]
    name = files_cfg["dataset"]
    assert name, "set files.dataset=<dir or mnist|fashion_mnist|cifar10>"
    n_files = files_cfg["n_files"]
    grayscale = bool(sim_cfg["grayscale"])

    dataset_is_CHW = False
    if os.path.isdir(name):
        ds = _DirImages(name, files_cfg["image_ext"], n_files, grayscale)
    else:
        # torchvision path (needs the dataset on disk or egress)
        from torchvision import datasets, transforms

        tfs = [transforms.ToTensor()]
        if grayscale:
            tfs.append(transforms.Grayscale())
        transform = transforms.Compose(tfs)
        cls = {"mnist": datasets.MNIST, "fashion_mnist": datasets.FashionMNIST,
               "cifar10": datasets.CIFAR10}[name]
        tv = cls(root="data", train=True, download=True, transform=transform)

        class _TV:
            def __len__(self):
                return min(len(tv), n_files) if n_files else len(tv)

            def __getitem__(self, idx):
                return np.asarray(tv[idx][0])

        ds = _TV()
        dataset_is_CHW = True

    # PSF: from file, or a synthetic random-diffuser PSF
    if files_cfg["psf"]:
        psf = np.asarray(load_psf(files_cfg["psf"],
                                  downsample=sim_cfg["downsample"]), np.float32)
        if grayscale and psf.shape[-1] == 3:
            psf = np.asarray(rgb2gray(psf))
    else:
        rng = np.random.RandomState(0)
        c = 1 if grayscale else 3
        psf = rng.rand(1, 32, 48, c).astype(np.float32)
        psf /= np.linalg.norm(psf)

    simulator = FarFieldSimulator(
        psf=psf,
        object_height=sim_cfg["object_height"],
        scene2mask=sim_cfg["scene2mask"],
        mask2sensor=sim_cfg["mask2sensor"],
        sensor=sim_cfg["sensor"],
        snr_db=sim_cfg["snr_db"],
        max_val=sim_cfg["max_val"],
    )
    ds_prop = SimulatedFarFieldDataset(ds, simulator,
                                       dataset_is_CHW=dataset_is_CHW)

    n_batches = 0
    t0 = time.time()
    for batch in ds_prop.batches(batch_size=int(files_cfg["batch_size"]),
                                 shuffle=True):
        x, target = batch["lensless"], batch["lensed"]
        if n_batches == 0:
            print("Batch shape  :", x.shape)
            print("Target shape :", target.shape)
        n_batches += 1
    dt = (time.time() - t0) / max(n_batches, 1)
    print(f"Time per batch : {dt:.4f} s")
    print(f"Went through {n_batches} batches.")
    return n_batches


if __name__ == "__main__":
    simulate()
