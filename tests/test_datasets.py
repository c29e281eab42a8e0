"""Dataset layer: pipelines, batching, ROI extraction, simulate_dataset."""

import numpy as np
import pytest

from lenslesspicam_tpu.data.datasets import (
    DualDataset,
    MeasuredDataset,
    SimulatedFarFieldDataset,
    available_datasets,
    natural_sort,
    simulate_dataset,
)


class _Toy(DualDataset):
    def __init__(self, n=6, **kwargs):
        super().__init__(**kwargs)
        self.n = n
        rng = np.random.RandomState(0)
        self.lensless = rng.rand(n, 16, 24, 3).astype(np.float32)
        self.lensed = rng.rand(n, 16, 24, 3).astype(np.float32)

    def __len__(self):
        return self.n

    def _get_images_pair(self, idx):
        return self.lensless[idx], self.lensed[idx]


def test_pipeline_and_batches():
    ds = _Toy(input_snr=20, flip_lr=True)
    x, y = ds[0]
    assert x.shape == (1, 16, 24, 3) and y.shape == (1, 16, 24, 3)
    batches = list(ds.batches(batch_size=4))
    assert batches[0]["lensless"].shape == (4, 1, 16, 24, 3)
    assert batches[1]["lensless"].shape == (2, 1, 16, 24, 3)


def test_downsample():
    ds = _Toy(downsample=2)
    x, _ = ds[0]
    assert x.shape == (1, 8, 12, 3)


def test_extract_roi_crop_and_alignment():
    ds = _Toy()
    recon = np.random.RandomState(1).rand(2, 1, 16, 24, 3).astype(np.float32)
    lensed = np.random.RandomState(2).rand(2, 1, 16, 24, 3).astype(np.float32)

    ds.crop = {"vertical": (2, 10), "horizontal": (4, 20)}
    r, l = ds.extract_roi(recon, lensed=lensed)
    assert r.shape == (2, 1, 8, 16, 3) and l.shape == r.shape

    ds.crop = None
    ds.alignment = {"top_left": (2, 4), "height": 8, "width": 16}
    r2 = ds.extract_roi(recon)
    assert r2.shape == (2, 1, 8, 16, 3)

    # flip-aware: flipping input then extracting with flags == plain extract
    flags = np.array([True, False])
    flipped = recon.copy()
    flipped[0] = flipped[0, :, :, ::-1, :]
    r3 = ds.extract_roi(flipped, flip_lr=flags)
    r3_undone = r3.copy()
    r3_undone[0] = r3_undone[0, :, :, ::-1, :]
    np.testing.assert_allclose(r3_undone, r2, atol=1e-6)


def test_measured_dataset(tmp_path):
    rng = np.random.RandomState(3)
    for sub in ("diffuser", "lensed"):
        (tmp_path / sub).mkdir()
    for i in range(4):
        np.save(tmp_path / "diffuser" / f"im{i}.npy", rng.rand(8, 10, 3).astype(np.float32))
        np.save(tmp_path / "lensed" / f"im{i}.npy", rng.rand(8, 10, 3).astype(np.float32))
    ds = MeasuredDataset(str(tmp_path))
    assert len(ds) == 4
    x, y = ds[1]
    assert x.shape == (1, 8, 10, 3)


def test_natural_sort():
    files = ["im10.npy", "im2.npy", "im1.npy"]
    assert natural_sort(files) == ["im1.npy", "im2.npy", "im10.npy"]


def test_simulate_dataset_offline():
    rng = np.random.RandomState(4)
    psf = rng.rand(1, 32, 48, 3).astype(np.float32)
    psf /= np.linalg.norm(psf)
    ds = simulate_dataset({"dataset": "random", "n_files": 5}, psf=psf)
    assert len(ds) == 5
    x, y = ds[0]
    assert x.shape[-1] == 3 and y.shape[-1] == 3
    assert ds.psf is not None


def test_registry():
    assert "diffusercam_mirflickr" in available_datasets
    assert len(available_datasets) >= 12
