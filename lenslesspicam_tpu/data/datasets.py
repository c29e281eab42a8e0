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

try:
    import cv2

    _INTER_NEAREST = cv2.INTER_NEAREST
except Exception:  # pragma: no cover
    _INTER_NEAREST = 0

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

    Requires the ``datasets`` package and network/cache access.  Full
    reference feature set:

    * PSF download (``psf=``) with ``flip=rotate``, ``shape`` matched to
      the downsampled lensless sample and ``bg_pix=(0, 15)``
      (dataset.py:1579-1589), or on-the-fly PSF *simulation* from stored
      mask patterns via :class:`AdafruitLCD` — single-mask
      (``mask_pattern.npy``) or multimask per-sample PSFs keyed by the
      ``mask_label`` column (dataset.py:1613-1650);
    * PSF noise injection at ``psf_snr`` dB (dataset.py:1596-1607);
    * alignment/crop geometry scaled by ``downsample``
      (dataset.py:1540-1571) and an optional ``FarFieldSimulator`` built
      from ``alignment["simulation"]`` (dataset.py:1660-1675);
    * measured backgrounds ('ambient' column) and *simulated*
      backgrounds added at a random SNR drawn from ``bg_snr_range``
      (dataset.py:1677-1694, 1894-1907);
    * random-flip augmentation returning flip flags + flipped PSF
      (dataset.py:1857-1892) — deterministic per (seed, epoch, idx) so
      ``extra_fields`` reproduces the draw made by ``__getitem__``.
    """

    def __init__(self, huggingface_repo, split="test", n_files=None, psf=None,
                 display_res=None, alignment=None, rotate=False,
                 flipud=False, flip_lensed=False, downsample=1,
                 downsample_lensed=1, single_channel_psf=False,
                 psf_snr=None, sensor="rpi_hq", slm="adafruit",
                 return_mask_label=False, save_psf=False,
                 simulation=None, simulate_lensless=False, force_rgb=False,
                 cache_dir=None, random_flip=False, bg_snr_range=None,
                 bg_fp=None, **kwargs):
        super().__init__(**kwargs)
        if isinstance(split, str):
            try:
                from datasets import load_dataset
            except ImportError as e:
                raise ImportError("HFDataset requires the `datasets` package") from e
            if n_files is not None:
                split = f"{split}[0:{n_files}]"
            self.ds = load_dataset(huggingface_repo, split=split,
                                   cache_dir=cache_dir)
        else:  # pre-loaded Dataset object (reference dataset.py:1500-1506)
            self.ds = split
        self.repo = huggingface_repo
        self.rotate = rotate
        self.flipud = flipud
        self.flip_lensed = flip_lensed
        self.downsample_lensless = downsample
        self.downsample_lensed = downsample_lensed
        self.display_res = display_res
        self.simulation_config = simulation or {}
        self.sensor = sensor
        self.slm = slm
        self.force_rgb = force_rgb
        self.return_mask_label = return_mask_label
        self.random_flip = random_flip
        self._flip_seed = kwargs.get("seed", 0)
        self._epoch = 0

        # probe first sample for geometry (dataset.py:1522-1536)
        data_0 = self.ds[0]
        lensless0 = np.asarray(data_0["lensless"])
        if self.downsample_lensless != 1:
            lensless0 = _resize(lensless0[None].astype(np.float32),
                                factor=1 / self.downsample_lensless)[0]
        self._lensless_shape = lensless0.shape[:2]

        # alignment geometry, scaled by downsample (dataset.py:1540-1571)
        if alignment is not None:
            top_left = alignment.get("top_left", alignment.get("topright"))
            if top_left is not None:
                self.alignment = dict(alignment)
                self.alignment["top_left"] = (
                    int(top_left[0] / downsample), int(top_left[1] / downsample))
                self.alignment["height"] = int(alignment["height"] / downsample)
                if "width" in alignment:
                    self.alignment["width"] = int(alignment["width"] / downsample)
                else:
                    assert display_res is not None
                    self.alignment["width"] = int(
                        self.alignment["height"] * display_res[1] / display_res[0])
            elif alignment.get("crop") is not None:
                self.crop = {
                    k: [int(v[0] / downsample), int(v[1] / downsample)]
                    for k, v in alignment["crop"].items()
                }

        # PSF: download from repo, or simulate from mask pattern(s)
        self.multimask = False
        if psf is not None:
            from huggingface_hub import hf_hub_download

            psf_fp = hf_hub_download(repo_id=huggingface_repo, filename=psf,
                                     repo_type="dataset")
            from .io import load_psf

            # reference passes flip=rotate, shape matched to the
            # (downsampled) lensless sample, bg_pix=(0, 15)
            # (dataset.py:1580-1589)
            self.psf = load_psf(
                psf_fp, shape=tuple(self._lensless_shape) + (3,),
                return_float=True,
                flip=self.rotate, flip_ud=flipud, bg_pix=(0, 15),
                force_rgb=force_rgb, single_psf=single_channel_psf,
            )
            if single_channel_psf:
                self.psf = np.repeat(self.psf, 3, axis=-1)
            if psf_snr is not None:
                # Gaussian noise at target SNR (dataset.py:1596-1607)
                rng = np.random.RandomState(self._flip_seed)
                noise = rng.randn(*self.psf.shape).astype(np.float32)
                noise *= np.sqrt(self.psf.var() / noise.var()) / 10 ** (psf_snr / 20)
                self.psf = self.psf + noise
        elif "mask_label" in self.ds.column_names:
            # multimask: simulate one PSF per mask label (1613-1634)
            self.multimask = True
            labels = sorted({self.ds[i]["mask_label"] for i in range(len(self.ds))})
            self.mask_labels = labels
            self.psf = {lab: np.asarray(self.simulate_psf(self.get_mask_vals(lab)))
                        for lab in labels}
        else:
            # single mask pattern (1640-1650)
            from huggingface_hub import hf_hub_download

            mask_fp = hf_hub_download(repo_id=huggingface_repo,
                                      filename="mask_pattern.npy",
                                      repo_type="dataset")
            self.psf = np.asarray(self.simulate_psf(np.load(mask_fp)))
        if save_psf and not isinstance(self.psf, dict):
            from .io import save_image

            save_image(np.asarray(self.psf).squeeze(), f"{split}_psf.png")

        # simulator from alignment["simulation"] (dataset.py:1654-1675)
        self.simulate_lensless = simulate_lensless
        self.simulator = None
        if alignment is not None and "simulation" in alignment:
            from .simulation import FarFieldSimulator

            sim_cfg = dict(alignment["simulation"])
            ref_psf = (next(iter(self.psf.values())) if isinstance(self.psf, dict)
                       else self.psf)
            sim_cfg["output_dim"] = tuple(np.asarray(ref_psf).shape[-3:-1])
            for key in ("vertical_shift", "horizontal_shift"):
                if sim_cfg.get(key) is not None:
                    sim_cfg[key] = int(sim_cfg[key] / downsample)
            sim_cfg.pop("random_vflip", None)
            sim_cfg.pop("random_hflip", None)
            self.simulator = FarFieldSimulator(
                psf=ref_psf if simulate_lensless else None, **sim_cfg)

        # simulated background at random SNR (dataset.py:1677-1694)
        self.bg_sim = None
        self.bg_snr_range = bg_snr_range
        if bg_fp is not None:
            assert bg_snr_range is not None, (
                "bg_snr_range must accompany a background file")
            from .io import load_image

            bg = load_image(bg_fp, shape=tuple(self._lensless_shape) + (3,),
                            return_float=True, flip=rotate)
            self.bg_sim = np.asarray(bg, np.float32)
            self.background_var = float(self.bg_sim.var())

        self.measured_bg = "ambient" in self.ds.column_names

    def __len__(self):
        return len(self.ds)

    def set_epoch(self, epoch: int):
        """Re-seed the per-index augmentation draws (new epoch)."""
        self._epoch = int(epoch)

    # -- PSF simulation from mask patterns (dataset.py:1710-1722) ------

    def get_mask_vals(self, label):
        from huggingface_hub import hf_hub_download

        mask_fp = hf_hub_download(repo_id=self.repo,
                                  filename=f"masks/mask_{label}.npy",
                                  repo_type="dataset")
        return np.load(mask_fp)

    def simulate_psf(self, mask_vals):
        from ..hardware.sensor import VirtualSensor
        from ..hardware.trainable_mask import AdafruitLCD

        sensor_res = VirtualSensor.from_name(self.sensor).resolution
        downsample_fact = float(min(np.asarray(sensor_res) /
                                    np.asarray(self._lensless_shape)))
        mask = AdafruitLCD(
            initial_vals=np.asarray(mask_vals, np.float32),
            sensor=self.sensor,
            downsample=downsample_fact,
            flipud=self.rotate or self.flipud,
            scene2mask=self.simulation_config.get("scene2mask", 0.55) or 0.55,
            mask2sensor=self.simulation_config.get("mask2sensor", 0.004) or 0.004,
            deadspace=self.simulation_config.get("deadspace", True),
        )
        psf = np.asarray(mask.get_psf(mask.params))
        # real datasets divide the sensor grid evenly so this is a no-op;
        # at other geometries align the PSF to the measurement grid
        # (the reference asserts equality instead, dataset.py:1390-1392)
        if tuple(psf.shape[-3:-1]) != tuple(self._lensless_shape):
            psf = _resize(psf, shape=tuple(self._lensless_shape) + (psf.shape[-1],))
        return psf

    # -- per-index deterministic augmentation draws ---------------------

    def _augment_draws(self, idx):
        """(flip_lr, flip_ud, bg_target_snr) for this (seed, epoch, idx).

        Shared by ``__getitem__`` and ``extra_fields`` so both see the
        same random augmentation (the reference draws once inside its
        combined __getitem__, dataset.py:1857-1907)."""
        rng = np.random.RandomState([self._flip_seed, self._epoch, int(idx)])
        flip_lr = bool(rng.rand() > 0.5) if self.random_flip else False
        flip_ud = bool(rng.rand() > 0.5) if self.random_flip else False
        target_snr = None
        if self.bg_sim is not None:
            target_snr = float(rng.uniform(self.bg_snr_range[0],
                                           self.bg_snr_range[1]))
        return flip_lr, flip_ud, target_snr

    def _to_array(self, pil_or_arr):
        arr = np.asarray(pil_or_arr)
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
        elif arr.dtype in (np.uint16, np.int32, np.int64):
            arr = arr.astype(np.float32) / 65535.0
        else:
            arr = arr.astype(np.float32)
        if self.force_rgb and arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=2)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return arr

    def _get_images_pair(self, idx):
        item = self.ds[int(idx)]
        lensless = self._to_array(item["lensless"])
        lensed = self._to_array(item["lensed"])
        if self.downsample_lensless != 1:
            lensless = _resize(lensless[None], factor=1 / self.downsample_lensless,
                               interpolation=_INTER_NEAREST)[0]

        if self.simulator is not None:
            # project original image to the lensed (object) plane; with
            # simulate_lensless also synthesize the measurement
            # (dataset.py:1788-1801)
            if self.simulate_lensless:
                lensless_s, lensed = self.simulator.propagate_image(
                    lensed, return_object_plane=True)
                lensless = np.asarray(lensless_s)
            else:
                lensed = np.asarray(self.simulator.propagate_image(
                    lensed, return_object_plane=True)[1])
        elif self.alignment is not None:
            lensed = _resize(lensed[None], shape=(
                self.alignment["height"], self.alignment["width"], 3),
                interpolation=_INTER_NEAREST)[0]
        elif self.display_res is not None:
            lensed = _resize(lensed[None], shape=tuple(self.display_res) + (3,),
                             interpolation=_INTER_NEAREST)[0]
        elif self.downsample_lensed != 1:
            lensed = _resize(lensed[None], factor=1 / self.downsample_lensed,
                             interpolation=_INTER_NEAREST)[0]

        if not self.simulate_lensless:
            if self.rotate:
                lensless = np.rot90(lensless, 2).copy()
            if self.flipud:
                lensless = lensless[::-1].copy()
        if self.flip_lensed:
            if self.rotate:
                lensed = np.rot90(lensed, 2).copy()
            if self.flipud:
                lensed = lensed[::-1].copy()

        # random-flip augmentation (dataset.py:1857-1880)
        flip_lr, flip_ud, target_snr = self._augment_draws(idx)
        if flip_lr:
            lensless = lensless[:, ::-1].copy()
            lensed = lensed[:, ::-1].copy()
        if flip_ud:
            lensless = lensless[::-1].copy()
            lensed = lensed[::-1].copy()

        # simulated background at the drawn SNR (dataset.py:1894-1907)
        if self.bg_sim is not None:
            sig_var = float(lensless.var())
            alpha = np.sqrt(sig_var / self.background_var /
                            (10 ** (target_snr / 10)))
            scaled_bg = alpha * self.bg_sim
            if flip_lr:
                scaled_bg = scaled_bg[:, ::-1]
            if flip_ud:
                scaled_bg = scaled_bg[::-1]
            lensless = lensless + scaled_bg
        return lensless, lensed

    def extra_fields(self, idx):
        out = {}
        flip_lr, flip_ud, target_snr = self._augment_draws(idx)

        psf = None
        if self.multimask:
            label = self.ds[int(idx)]["mask_label"]
            if self.return_mask_label:
                out["mask_label"] = np.asarray(label)
            else:
                psf = np.asarray(self.psf[label])
        elif self.random_flip:
            psf = np.asarray(self.psf)
        if psf is not None:
            if flip_lr:
                psf = psf[:, :, ::-1].copy()
            if flip_ud:
                psf = psf[:, ::-1].copy()
            out["psfs"] = psf
        if self.random_flip:
            out["flip_lr"] = np.asarray(flip_lr)
            out["flip_ud"] = np.asarray(flip_ud)

        if self.bg_sim is not None:
            # return the scaled background that was added (1894-1907),
            # recomputing alpha from the raw (pre-background) measurement
            item_lensless = self._raw_lensless(idx)
            sig_var = float(item_lensless.var())
            alpha = np.sqrt(sig_var / self.background_var /
                            (10 ** (target_snr / 10)))
            scaled_bg = alpha * self.bg_sim
            if flip_lr:
                scaled_bg = scaled_bg[:, ::-1]
            if flip_ud:
                scaled_bg = scaled_bg[::-1]
            out["background"] = scaled_bg[None]
        elif self.measured_bg:
            bg = self._to_array(self.ds[int(idx)]["ambient"])
            if self.downsample_lensless != 1:
                bg = _resize(bg[None], factor=1 / self.downsample_lensless,
                             interpolation=_INTER_NEAREST)[0]
            out["background"] = bg[None]
        return out

    def _raw_lensless(self, idx):
        """The measurement before background addition (for bg scaling)."""
        item = self.ds[int(idx)]
        lensless = self._to_array(item["lensless"])
        if self.downsample_lensless != 1:
            lensless = _resize(lensless[None], factor=1 / self.downsample_lensless,
                               interpolation=_INTER_NEAREST)[0]
        if not self.simulate_lensless:
            if self.rotate:
                lensless = np.rot90(lensless, 2).copy()
            if self.flipud:
                lensless = lensless[::-1].copy()
        return lensless


class HFSimulated(DualDataset):
    """HF dataset where the *lensless* image is simulated from the
    lensed one by convolving with the (downloaded or mask-simulated)
    PSF (dataset.py:1180-1420).

    Used to compare simulated measurements with real ones.  Supports a
    single downloaded PSF or multimask per-sample simulated PSFs, shot
    noise at ``snr_db``, and the alignment paste: the lensed image is
    resized to the alignment crop and pasted onto a lensless-shaped
    canvas before convolution (dataset.py:1378-1392).
    """

    def __init__(self, huggingface_repo, split, n_files=None, psf=None,
                 downsample=1, cache_dir=None, single_channel_psf=False,
                 flipud=False, display_res=None, alignment=None,
                 sensor="rpi_hq", slm="adafruit", simulation_config=None,
                 snr_db=40, **kwargs):
        super().__init__(**kwargs)
        if isinstance(split, str):
            from datasets import load_dataset

            if n_files is not None:
                split = f"{split}[0:{n_files}]"
            self.ds = load_dataset(huggingface_repo, split=split,
                                   cache_dir=cache_dir)
        else:
            self.ds = split
        self.repo = huggingface_repo
        self.flipud = flipud
        self.rotate = False
        self.snr_db = snr_db
        self.sensor = sensor
        self.slm = slm
        self.simulation_config = simulation_config or {}
        self._ds_downsample = downsample

        lensless0 = np.asarray(self.ds[0]["lensless"])
        self.lensless_shape = tuple(np.array(lensless0.shape[:2]) // downsample)

        # PSF: download, or simulate per mask label (dataset.py:1219-1334)
        self.multimask = False
        if psf is not None:
            from huggingface_hub import hf_hub_download

            from .io import load_psf

            psf_fp = hf_hub_download(repo_id=huggingface_repo, filename=psf,
                                     repo_type="dataset")
            self.psf = load_psf(psf_fp, shape=tuple(self.lensless_shape) + (3,),
                                return_float=True, flip_ud=flipud,
                                bg_pix=(0, 15), single_psf=single_channel_psf)
            if single_channel_psf:
                self.psf = np.repeat(self.psf, 3, axis=-1)
        elif "mask_label" in self.ds.column_names:
            self.multimask = True
            labels = sorted({self.ds[i]["mask_label"] for i in range(len(self.ds))})
            self.mask_labels = labels
            self.psf = {lab: np.asarray(self.simulate_psf(self.get_mask_vals(lab)))
                        for lab in labels}
        else:
            raise ValueError("provide a psf filename or a multimask dataset")

        self._convolvers = {}

        # alignment geometry (dataset.py:1344-1360)
        self.display_res = display_res
        self.cropped_lensed_shape = None
        if alignment is not None:
            self.alignment = dict(alignment)
            self.alignment["top_left"] = (
                int(alignment["top_left"][0] / downsample),
                int(alignment["top_left"][1] / downsample))
            self.alignment["height"] = int(alignment["height"] / downsample)
            self.alignment["width"] = int(
                self.alignment["height"] * display_res[1] / display_res[0])
            self.cropped_lensed_shape = (
                self.alignment["height"], self.alignment["width"], 3)

    def __len__(self):
        return len(self.ds)

    get_mask_vals = HFDataset.get_mask_vals
    simulate_psf = HFDataset.simulate_psf

    @property
    def _lensless_shape(self):  # used by simulate_psf
        return self.lensless_shape

    def _convolver_for(self, psf):
        from ..ops.fft_conv import FFTConvolver

        key = id(psf)
        if key not in self._convolvers:
            self._convolvers[key] = FFTConvolver.from_psf(
                np.asarray(psf), pad=True, norm="backward")
        return self._convolvers[key]

    def _get_images_pair(self, idx):
        import jax.numpy as jnp

        item = self.ds[int(idx)]
        lensed = np.asarray(item["lensed"])
        if self.flipud:
            lensed = np.flipud(lensed)
        if lensed.dtype == np.uint8:
            lensed = lensed.astype(np.float32) / 255.0
        else:
            lensed = lensed.astype(np.float32) / 65535.0
        if lensed.ndim == 2:
            lensed = lensed[:, :, None]

        cropped = None
        if self.cropped_lensed_shape is not None:
            cropped = _resize(lensed[None], shape=self.cropped_lensed_shape,
                              interpolation=_INTER_NEAREST)[0]
            canvas = np.zeros(tuple(self.lensless_shape) + (3,), np.float32)
            ty, tx = self.alignment["top_left"]
            canvas[ty : ty + self.alignment["height"],
                   tx : tx + self.alignment["width"]] = cropped
            lensed = canvas
        elif tuple(lensed.shape[:2]) != tuple(self.lensless_shape):
            lensed = _resize(lensed[None], shape=tuple(self.lensless_shape) + (3,),
                             interpolation=_INTER_NEAREST)[0]

        psf = (self.psf[item["mask_label"]] if self.multimask else self.psf)
        conv = self._convolver_for(psf)
        lensless = np.asarray(conv.convolve(jnp.asarray(lensed[None])))[0]

        if self.snr_db is not None:
            import jax

            from ..ops.noise import add_shot_noise

            key = jax.random.PRNGKey(int(self._rng.randint(0, 2**31)))
            lensless = np.asarray(add_shot_noise(lensless, self.snr_db, key))
        if lensless.max() > 1:
            lensless = lensless / lensless.max()

        return lensless, (cropped if cropped is not None else lensed)

    def extra_fields(self, idx):
        if self.multimask:
            return {"psfs": np.asarray(self.psf[self.ds[int(idx)]["mask_label"]])}
        return {}


class DigiCamCelebA(DualDataset):
    """Measured DigiCam lensless images paired with CelebA originals
    projected to the lensed plane by simulation (dataset.py:564-736).

    ``measured_dir`` holds png measurements named like the CelebA jpgs;
    defaults (flip, shifts, crop, downsample scaling) follow the
    ``celeba_adafruit_random_2mm_20230720_10K`` recipe.
    """

    def __init__(self, celeba_root, measured_dir, psf_path, downsample=1,
                 flip=True, vertical_shift=None, horizontal_shift=None,
                 crop=None, simulation_config=None, **kwargs):
        super().__init__(**kwargs)
        from .io import load_psf

        if vertical_shift is None:
            vertical_shift = -85
            horizontal_shift = -5
        if crop is None:
            crop = {"vertical": [30, 560], "horizontal": [285, 720]}
        self.crop = {k: [int(v[0] // downsample), int(v[1] // downsample)]
                     for k, v in crop.items()}
        self.vertical_shift = int(vertical_shift // downsample)
        self.horizontal_shift = int(horizontal_shift // downsample)
        self.flip_measurement = flip
        self.pre_downsample = downsample

        # PSF is stored at 4x the measurement resolution (dataset.py:676-686)
        self.psf, self.background = load_psf(
            psf_path, downsample=downsample * 4, return_float=True,
            return_bg=True, flip=flip, bg_pix=(0, 15))

        from .simulation import FarFieldSimulator

        sim_cfg = dict(simulation_config or {})
        sim_cfg["output_dim"] = tuple(np.asarray(self.psf).shape[-3:-1])
        sim_cfg.setdefault("sensor", "rpi_hq")
        self.sim = FarFieldSimulator(psf=None, **sim_cfg)

        self.measured_dir = measured_dir
        self.original_dir = os.path.join(celeba_root, "celeba", "img_align_celeba")
        self.files = natural_sort(
            [os.path.basename(f) for f in glob.glob(os.path.join(measured_dir, "*.png"))]
        )

    def __len__(self):
        return len(self.files)

    def _get_images_pair(self, idx):
        from .io import load_image

        lensless_fp = os.path.join(self.measured_dir, self.files[idx])
        original_fp = os.path.join(self.original_dir, self.files[idx][:-3] + "jpg")
        lensless = load_image(lensless_fp, downsample=self.pre_downsample,
                              flip=self.flip_measurement, return_float=True)
        original = load_image(original_fp, return_float=True)

        # project original to the lensed plane + alignment rolls
        # (dataset.py:728-734)
        lensed = np.asarray(self.sim.propagate_image(
            original, return_object_plane=True)[1])
        if self.vertical_shift:
            lensed = np.roll(lensed, self.vertical_shift, axis=-3)
        if self.horizontal_shift:
            lensed = np.roll(lensed, self.horizontal_shift, axis=-2)
        return lensless, lensed


class SimulatedDatasetTrainableMask(SimulatedFarFieldDataset):
    """Simulated dataset whose PSF is regenerated from a trainable mask
    (dataset.py:980-1032): ``set_psf`` refreshes the simulator with the
    current learned mask values each optimization step."""

    def __init__(self, mask, dataset, simulator, **kwargs):
        self._mask = mask
        if simulator.conv is None:
            simulator.set_psf(np.asarray(mask.get_psf(mask.params)))
        assert not simulator.quantize, (
            "simulator must not quantize (differentiability; dataset.py:1014-1016)")
        super().__init__(dataset, simulator, **kwargs)

    def set_psf(self, psf=None):
        if psf is None:
            psf = self._mask.get_psf(self._mask.params)
        self.sim.set_psf(np.asarray(psf))
        self.psf = np.asarray(self.sim.get_psf())


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
        fp, _ = remote.capture(self.rpi_username, self.rpi_hostname,
                               output_path="/tmp", **self.capture_kwargs)
        lensless = load_image(fp, return_float=True)
        return lensless, lensed
