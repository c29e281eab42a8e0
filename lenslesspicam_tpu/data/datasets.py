"""Datasets: paired (lensless, lensed) data for training / evaluation.

Re-design of lensless/utils/dataset.py.  Datasets here are simple
python iterables yielding numpy dict batches ``{"lensless", "lensed",
["psfs"], ["background"], ["flip_lr"], ["flip_ud"]}`` with arrays in the
canonical (B, D, H, W, C) layout — feeding jit train/eval steps without
a torch DataLoader.

Components (reference file:line):

* ``available_datasets`` registry of HF-hosted datasets with per-dataset
  geometry (dataset.py:50-164) + ``get_dataset`` (175-203);
* ``DualDataset`` base pipeline: downsample -> 4D promotion ->
  background subtraction -> shot noise at ``input_snr`` -> flips ->
  transforms (dataset.py:296-347);
* ``SimulatedFarFieldDataset`` propagating an image dataset through
  FarFieldSimulator (dataset.py:350-455);
* ``MeasuredDataset`` folder-of-file pairs (dataset.py:458-560);
* ``HFDataset`` workhorse: HF-hub parquet data, PSF download or
  simulation from mask patterns, alignment/crop geometry, measured or
  simulated backgrounds, random-flip augmentation, ``extract_roi``
  with flip-aware inverse transforms (dataset.py:1423-2065);
* ``simulate_dataset`` config-driven builder (dataset.py:2068-2282).
"""

from __future__ import annotations

import glob
import os
import re
from typing import Iterator, Optional

import numpy as np

from .image import resize as _resize

available_datasets = {
    "diffusercam_mirflickr": {
        "size (GB)": 7.58,
        "huggingface_repo": "bezzam/DiffuserCam-Lensless-Mirflickr-Dataset-NORM",
        "psf": "psf.tiff",
        "single_channel_psf": True,
        "flipud": True,
        "flip_lensed": True,
        "downsample": 2,
        "downsample_lensed": 2,
    },
    "tapecam_mirflickr": {
        "size (GB)": 10.5,
        "huggingface_repo": "bezzam/TapeCam-Mirflickr-25K",
        "psf": "psf.png",
        "display_res": [900, 1200],
        "alignment": {"top_left": [45, 95], "height": 250},
    },
    "digicam_celeba": {
        "size (GB)": 33.9,
        "huggingface_repo": "bezzam/DigiCam-CelebA-26K",
        "psf": "psf_simulated.png",
        "rotate": True,
        "split_seed": 0,
        "downsample": 2,
        "alignment": {"crop": {"vertical": [0, 525], "horizontal": [265, 695]}},
        "simulation": {
            "scene2mask": 0.25,
            "mask2sensor": 0.002,
            "object_height": 0.33,
            "sensor": "rpi_hq",
            "snr_db": None,
            "downsample": None,
            "random_vflip": False,
            "random_hflip": False,
            "quantize": False,
            "vertical_shift": -117,
            "horizontal_shift": -25,
        },
    },
    "digicam_mirflickr": {
        "size (GB)": 11.9,
        "huggingface_repo": "bezzam/DigiCam-Mirflickr-SingleMask-25K",
        "display_res": [900, 1200],
        "rotate": True,
        "alignment": {"top_left": [80, 100], "height": 200},
    },
    "digicam_mirflickr_mini": {
        "size (GB)": 0.472,
        "huggingface_repo": "bezzam/DigiCam-Mirflickr-SingleMask-1K",
        "display_res": [900, 1200],
        "rotate": True,
        "alignment": {"top_left": [80, 100], "height": 200},
    },
    "digicam_mirflickr_multi": {
        "size (GB)": 12,
        "huggingface_repo": "bezzam/DigiCam-Mirflickr-MultiMask-25K",
        "display_res": [900, 1200],
        "rotate": True,
        "alignment": {"top_left": [80, 100], "height": 200},
    },
    "digicam_mirflickr_multi_mini": {
        "size (GB)": 0.477,
        "huggingface_repo": "bezzam/DigiCam-Mirflickr-MultiMask-1K",
        "display_res": [900, 1200],
        "rotate": True,
        "alignment": {"top_left": [80, 100], "height": 200},
    },
    "multilens_mirflickr_ambient": {
        "size (GB)": 16.7,
        "huggingface_repo": "Lensless/MultiLens-Mirflickr-Ambient",
        "psf": "psf.png",
        "display_res": [600, 600],
        "alignment": {"top_left": [118, 220], "height": 123},
    },
    "multilens_mirflickr_ambient_mini": {
        "size (GB)": 0.0677,
        "huggingface_repo": "Lensless/MultiLens-Mirflickr-Ambient-100",
        "psf": "psf.png",
        "display_res": [600, 600],
        "alignment": {"top_left": [118, 220], "height": 123},
    },
    "multilens_mirflickr_mini": {
        "size (GB)": 0.427,
        "huggingface_repo": "Lensless/mirflickr_voronoi_1k",
        "psf": "psf_measured.png",
        "display_res": [900, 1200],
    },
    "mls_mirflickr_1k": {
        "size (GB)": 0.467,
        "huggingface_repo": "Lensless/mirflickr_CA_fine_1k",
        "psf": "psf_measured.png",
        "display_res": [900, 1200],
    },
    "fza_mirflickr_1k": {
        "size (GB)": 0.454,
        "huggingface_repo": "Lensless/Mirflickr_FZA_fine_1k",
        "psf": "psf_measured.png",
        "display_res": [900, 1200],
    },
}


def print_available_datasets():
    print("Available datasets:")
    for name, cfg in available_datasets.items():
        print(f"  {name} ({cfg['size (GB)']} GB) : {cfg['huggingface_repo']}")


def get_dataset(name: str, split: str = "test", **kwargs):
    """Instantiate a registered HF dataset (dataset.py:175-203)."""
    if name not in available_datasets:
        raise ValueError(
            f"Dataset {name} not available. Choose from {list(available_datasets)}"
        )
    cfg = dict(available_datasets[name])
    cfg.pop("size (GB)", None)
    repo = cfg.pop("huggingface_repo")
    cfg.update(kwargs)
    return HFDataset(huggingface_repo=repo, split=split, **cfg)


def natural_sort(paths):
    """Natural-order sort of file paths (dataset.py natural_sort)."""

    def key(s):
        return [int(t) if t.isdigit() else t.lower() for t in re.split(r"(\d+)", s)]

    return sorted(paths, key=key)


class DualDataset:
    """Base paired dataset (dataset.py:206-347).

    Subclasses implement ``__len__`` and ``_get_images_pair(idx)``
    returning (lensless, lensed) HWC/DHWC float arrays.
    """

    def __init__(self, downsample=1, background=None, input_snr=None,
                 flip=False, flip_ud=False, flip_lr=False,
                 transform_lensless=None, transform_lensed=None, seed=0, **kwargs):
        self.downsample = downsample
        self.background = background
        self.input_snr = input_snr
        self.flip = flip
        self.flip_ud = flip_ud
        self.flip_lr = flip_lr
        self.transform_lensless = transform_lensless
        self.transform_lensed = transform_lensed
        self._rng = np.random.RandomState(seed)
        self.psf = None
        self.alignment = None
        self.crop = None
        self.multimask = False
        self.random_flip = False
        self.measured_bg = False

    def __len__(self):
        raise NotImplementedError

    def _get_images_pair(self, idx):
        raise NotImplementedError

    def __getitem__(self, idx):
        lensless, lensed = self._get_images_pair(idx)
        lensless = np.asarray(lensless, np.float32)
        lensed = np.asarray(lensed, np.float32)

        if self.downsample != 1:
            lensless = _resize(lensless[None] if lensless.ndim == 3 else lensless,
                               factor=1 / self.downsample)
            lensed = _resize(lensed[None] if lensed.ndim == 3 else lensed,
                             factor=1 / self.downsample)
        # promote to (D, H, W, C)
        if lensless.ndim == 3:
            lensless = lensless[None]
        if lensed.ndim == 3:
            lensed = lensed[None]

        if self.background is not None:
            lensless = np.clip(lensless - self.background, 0, None)

        if self.input_snr is not None:
            import jax

            from ..ops.noise import add_shot_noise

            key = jax.random.PRNGKey(int(self._rng.randint(0, 2**31)))
            lensless = np.asarray(add_shot_noise(lensless, self.input_snr, key))

        if self.flip:
            lensless = lensless[:, ::-1, ::-1, :].copy()
            lensed = lensed[:, ::-1, ::-1, :].copy()
        if self.flip_ud:
            lensless = lensless[:, ::-1, :, :].copy()
            lensed = lensed[:, ::-1, :, :].copy()
        if self.flip_lr:
            lensless = lensless[:, :, ::-1, :].copy()
            lensed = lensed[:, :, ::-1, :].copy()

        if self.transform_lensless:
            lensless = self.transform_lensless(lensless)
        if self.transform_lensed:
            lensed = self.transform_lensed(lensed)
        return lensless, lensed

    # -- batching ------------------------------------------------------

    def batches(self, batch_size=4, shuffle=False, seed=0) -> Iterator[dict]:
        """Yield numpy dict batches for the Trainer / benchmark."""
        order = np.arange(len(self))
        if shuffle:
            np.random.RandomState(seed).shuffle(order)
        for start in range(0, len(order), batch_size):
            idxs = order[start : start + batch_size]
            items = [self[i] for i in idxs]
            batch = {
                "lensless": np.stack([it[0] for it in items]),
                "lensed": np.stack([it[1] for it in items]),
            }
            extras = [self.extra_fields(i) for i in idxs]
            for key in (extras[0] or {}):
                batch[key] = np.stack([e[key] for e in extras])
            yield batch

    def extra_fields(self, idx) -> dict:
        """Per-sample extra arrays (psfs, background, ...)."""
        return {}

    # -- ROI extraction (dataset.py:1913-2065) -------------------------

    def extract_roi(self, reconstruction, lensed=None, axis=(-3, -2),
                    flip_lr=None, flip_ud=None):
        """Alignment/crop ROI with flip-aware inverse transforms.

        reconstruction: (..., H, W, C) numpy array (axis defaults to the
        spatial axes of the canonical layout).
        """
        recon = np.asarray(reconstruction)

        def flip_axis(arr, mask_flags, ax):
            arr = arr.copy()
            flags = np.asarray(mask_flags).reshape(-1).astype(bool)
            arr[flags] = np.flip(arr[flags], axis=ax)
            return arr

        if flip_lr is not None:
            recon = flip_axis(recon, flip_lr, axis[1])
            if lensed is not None:
                lensed = flip_axis(np.asarray(lensed), flip_lr, axis[1])
        if flip_ud is not None:
            recon = flip_axis(recon, flip_ud, axis[0])
            if lensed is not None:
                lensed = flip_axis(np.asarray(lensed), flip_ud, axis[0])

        if self.alignment is not None:
            top_left = self.alignment["top_left"]
            height = self.alignment["height"]
            width = self.alignment["width"]
            index = [slice(None)] * recon.ndim
            index[axis[0]] = slice(top_left[0], top_left[0] + height)
            index[axis[1]] = slice(top_left[1], top_left[1] + width)
            recon = recon[tuple(index)]
        elif self.crop is not None:
            index = [slice(None)] * recon.ndim
            index[axis[0]] = slice(*self.crop["vertical"])
            index[axis[1]] = slice(*self.crop["horizontal"])
            recon = recon[tuple(index)]
            if lensed is not None:
                lensed = lensed[tuple(index)]

        if flip_lr is not None:
            recon = flip_axis(recon, flip_lr, axis[1])
        if flip_ud is not None:
            recon = flip_axis(recon, flip_ud, axis[0])

        if self.alignment is None and lensed is not None:
            return recon, lensed
        return recon


class SimulatedFarFieldDataset(DualDataset):
    """Simulate lensless measurements from an image dataset through
    FarFieldSimulator (dataset.py:350-455)."""

    def __init__(self, dataset, simulator, dataset_is_CHW=False, **kwargs):
        super().__init__(**kwargs)
        self.dataset = dataset
        self.sim = simulator
        self.dataset_is_CHW = dataset_is_CHW
        assert simulator.conv is not None, "simulator must have a PSF"
        self.psf = np.asarray(simulator.get_psf())

    def __len__(self):
        return len(self.dataset)

    def _get_images_pair(self, idx):
        obj = np.asarray(self.dataset[idx], np.float32)
        if self.dataset_is_CHW:
            obj = np.moveaxis(obj, 0, -1)
        if obj.ndim == 2:
            obj = obj[:, :, None]
        lensless, lensed = self.sim.propagate_image(obj, return_object_plane=True)
        return np.asarray(lensless), np.asarray(lensed)


class MeasuredDataset(DualDataset):
    """Folder-of-files dataset: matching (lensless, lensed) pairs
    (dataset.py:458-560)."""

    def __init__(self, root_dir, lensless_dir="diffuser", lensed_dir="lensed",
                 image_ext="npy", psf_path=None, **kwargs):
        super().__init__(**kwargs)
        self.lensless_files = natural_sort(
            glob.glob(os.path.join(root_dir, lensless_dir, f"*.{image_ext}"))
        )
        self.lensed_files = natural_sort(
            glob.glob(os.path.join(root_dir, lensed_dir, f"*.{image_ext}"))
        )
        assert len(self.lensless_files) == len(self.lensed_files), "file count mismatch"
        for a, b in zip(self.lensless_files, self.lensed_files):
            assert os.path.basename(a) == os.path.basename(b), "file name mismatch"
        if psf_path is not None:
            from .io import load_psf

            self.psf = load_psf(psf_path)

    def __len__(self):
        return len(self.lensless_files)

    def _load(self, fp):
        if fp.endswith(".npy"):
            return np.load(fp)
        from .io import load_image

        return load_image(fp, return_float=True)

    def _get_images_pair(self, idx):
        return self._load(self.lensless_files[idx]), self._load(self.lensed_files[idx])


class HFDataset(DualDataset):
    """Hugging-Face-hosted measured dataset (dataset.py:1423-2065).

    Requires the ``datasets`` package and network/cache access; geometry
    handling (alignment from display_res, crop, downsample, rotate,
    measured background 'ambient' key, multimask per-sample PSFs) follows
    the reference.
    """

    def __init__(self, huggingface_repo, split="test", psf=None,
                 display_res=None, alignment=None, rotate=False,
                 flipud=False, flip_lensed=False, downsample=1,
                 downsample_lensed=1, single_channel_psf=False,
                 simulation=None, **kwargs):
        super().__init__(**kwargs)
        try:
            from datasets import load_dataset
        except ImportError as e:
            raise ImportError("HFDataset requires the `datasets` package") from e

        self.ds = load_dataset(huggingface_repo, split=split)
        self.repo = huggingface_repo
        self.rotate = rotate
        self.flipud = flipud
        self.flip_lensed = flip_lensed
        self.downsample_lensless = downsample
        self.downsample_lensed = downsample_lensed
        self.display_res = display_res
        self.simulation_config = simulation

        # alignment geometry (dataset.py:1540-1571)
        if alignment is not None:
            if "top_left" in alignment:
                self.alignment = dict(alignment)
                height = self.alignment["height"]
                if "width" not in self.alignment:
                    assert display_res is not None
                    self.alignment["width"] = int(
                        height * display_res[1] / display_res[0]
                    )
            elif "crop" in alignment:
                self.crop = alignment["crop"]

        # PSF: download from repo or simulate from mask pattern
        if psf is not None:
            from huggingface_hub import hf_hub_download

            psf_fp = hf_hub_download(repo_id=huggingface_repo, filename=psf,
                                     repo_type="dataset")
            from .io import load_psf

            self.psf = load_psf(
                psf_fp, downsample=downsample, single_psf=single_channel_psf,
                flip_ud=flipud,
            )
            if single_channel_psf:
                self.psf = np.repeat(self.psf, 3, axis=-1)

        self.measured_bg = "ambient" in self.ds.column_names

    def __len__(self):
        return len(self.ds)

    def _to_array(self, pil_or_arr):
        arr = np.asarray(pil_or_arr, np.float32)
        if arr.max() > 1:
            arr = arr / 255.0
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return arr

    def _get_images_pair(self, idx):
        item = self.ds[int(idx)]
        lensless = self._to_array(item["lensless"])
        lensed = self._to_array(item["lensed"])
        if self.downsample_lensless != 1:
            lensless = _resize(lensless[None], factor=1 / self.downsample_lensless)[0]
        if self.display_res is not None:
            lensed = _resize(lensed[None], shape=tuple(self.display_res) + (3,))[0]
        elif self.downsample_lensed != 1:
            lensed = _resize(lensed[None], factor=1 / self.downsample_lensed)[0]
        if self.rotate:
            lensless = np.rot90(lensless, 2).copy()
        if self.flipud:
            lensless = lensless[::-1].copy()
        if self.flip_lensed:
            lensed = lensed[::-1, ::-1].copy()
        return lensless, lensed

    def extra_fields(self, idx):
        out = {}
        if self.measured_bg:
            out["background"] = self._to_array(self.ds[int(idx)]["ambient"])[None]
        return out


def simulate_dataset(config: dict, psf=None):
    """Config-driven simulated train/test builder (dataset.py:2068-2282).

    config: {"dataset": "mnist"|"fashion_mnist"|"cifar10"|<array list>,
    "n_files", "object_height", "scene2mask", "mask2sensor", "sensor",
    "snr_db", "downsample", "batch_size"}
    """
    from .simulation import FarFieldSimulator

    name = config.get("dataset", "random")
    n_files = config.get("n_files", 100)
    rng = np.random.RandomState(config.get("seed", 0))

    if isinstance(name, str) and name in ("mnist", "fashion_mnist", "cifar10"):
        from datasets import load_dataset

        hf = load_dataset(name, split="train").select(range(n_files))
        key = "image" if "image" in hf.column_names else "img"
        images = [np.asarray(im, np.float32) / 255.0 for im in hf[key]]
    elif isinstance(name, (list, np.ndarray)):
        images = [np.asarray(im, np.float32) for im in name]
    else:  # synthetic fallback (offline)
        images = [rng.rand(28, 28).astype(np.float32) for _ in range(n_files)]

    sim = FarFieldSimulator(
        object_height=config.get("object_height", 0.3),
        scene2mask=config.get("scene2mask", 0.55),
        mask2sensor=config.get("mask2sensor", 0.004),
        sensor=config.get("sensor", "rpi_hq"),
        psf=psf,
        snr_db=config.get("snr_db", 40),
        quantize=config.get("quantize", False),
    )
    return SimulatedFarFieldDataset(images, sim)


class DiffuserCamMirflickr(MeasuredDataset):
    """Measured DiffuserCam-MirFlickr dataset from local folders
    (dataset.py:820-894): BGR->RGB swap, PSF at 4x downsample, allowed
    indices 2..25000."""

    def __init__(self, dataset_dir, psf_path, downsample=2, **kwargs):
        super().__init__(
            dataset_dir, lensless_dir="diffuser_images",
            lensed_dir="ground_truth_lensed", image_ext="npy",
            downsample=downsample, **kwargs,
        )
        from .io import load_psf

        self.psf = load_psf(psf_path, downsample=4)
        self.allowed_idx = np.arange(2, 25001)

    def _get_images_pair(self, idx):
        lensless, lensed = super()._get_images_pair(idx)
        return lensless[..., ::-1], lensed[..., ::-1]  # BGR -> RGB


class DiffuserCamTestDataset(MeasuredDataset):
    """The standard 200-file DiffuserCam benchmark subset
    (dataset.py:897-977).  Download it once (no network egress here):
    https://github.com/LCAV/LenslessPiCam docs point to the hosted copy.
    """

    def __init__(self, data_dir, downsample=2, **kwargs):
        psf_path = os.path.join(data_dir, "psf.tiff")
        super().__init__(
            data_dir, lensless_dir="diffuser", lensed_dir="lensed",
            image_ext="npy", psf_path=psf_path if os.path.isfile(psf_path) else None,
            downsample=downsample, **kwargs,
        )


class HITLDatasetTrainableMask(DualDataset):
    """Hardware-in-the-loop dataset (dataset.py:1034-1121): every
    __getitem__ programs the current learned mask on the device,
    displays the lensed image, and captures a real measurement over
    SSH.  Gated on paramiko; compute-side code paths (mask值 -> pattern
    conversion) are exercised without hardware via ``simulate=True``.
    """

    def __init__(self, mask, base_dataset, rpi_username=None,
                 rpi_hostname=None, celeba_root=None, simulate=False,
                 display_kwargs=None, capture_kwargs=None, **kwargs):
        super().__init__(**kwargs)
        self.mask = mask
        self.base = base_dataset
        self.rpi_username = rpi_username
        self.rpi_hostname = rpi_hostname
        self.simulate = simulate
        self.display_kwargs = display_kwargs or {}
        self.capture_kwargs = capture_kwargs or {}

    def __len__(self):
        return len(self.base)

    def _get_images_pair(self, idx):
        lensed = np.asarray(self.base[idx], np.float32)
        if lensed.ndim == 2:
            lensed = lensed[:, :, None]

        psf = np.asarray(self.mask.get_psf(self.mask.params))
        if self.simulate:
            from ..ops.fft_conv import FFTConvolver
            import jax.numpy as jnp

            conv = FFTConvolver.from_psf(psf, pad=True, norm="backward")
            canvas = np.zeros(psf.shape[1:], np.float32)
            h = min(lensed.shape[0], canvas.shape[0])
            w = min(lensed.shape[1], canvas.shape[1])
            canvas[:h, :w, :] = lensed[:h, :w, : canvas.shape[-1]]
            lensless = np.asarray(conv.convolve(jnp.asarray(canvas[None])))[0]
            return lensless, canvas

        from ..hardware import remote
        from .io import load_image, save_image

        tmp_fp = "/tmp/hitl_display.png"
        save_image(lensed, tmp_fp)
        remote.display(tmp_fp, self.rpi_username, self.rpi_hostname,
                       **self.display_kwargs)
        pattern = np.asarray(self.mask.params.get("vals"))
        remote.set_programmable_mask(pattern, rpi_username=self.rpi_username,
                                     rpi_hostname=self.rpi_hostname)
        fp = remote.capture(self.rpi_username, self.rpi_hostname,
                            localdir="/tmp", **self.capture_kwargs)
        lensless = load_image(fp, return_float=True)
        return lensless, lensed
