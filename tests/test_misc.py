"""Aperture, plot, metric API, remote/fabrication gating."""

import numpy as np
import pytest

from lenslesspicam_tpu.hardware.aperture import (
    circ_aperture,
    line_aperture,
    rect_aperture,
    square_aperture,
)
from lenslesspicam_tpu.eval import metric as nm


def test_apertures():
    shape = (64, 80)
    pitch = (1e-4, 1e-4)
    rect = rect_aperture(shape, pitch, (2e-3, 3e-3))
    assert rect.values.shape == (3,) + shape
    assert rect.values.max() == 255
    sq = square_aperture(shape, pitch, 2e-3)
    ln = line_aperture(shape, pitch, 3e-3)
    ci = circ_aperture(shape, pitch, 1e-3)
    assert ci.values.sum() > 0
    assert sq.grayscale_values.shape == shape
    # physical addressing
    patch = rect.at((slice(1e-3, 3e-3), slice(1e-3, 3e-3)))
    assert patch.shape[0] == 3


def test_metric_api():
    rng = np.random.RandomState(0)
    a = rng.rand(32, 32, 3).astype(np.float32)
    b = np.clip(a + 0.05 * rng.randn(32, 32, 3).astype(np.float32), 0, 1)
    assert nm.mse(a, a) == 0
    assert nm.psnr(a, b) > nm.psnr(a, rng.rand(32, 32, 3))
    assert 0 < nm.ssim(a, b) <= 1
    with pytest.raises(RuntimeError):
        nm.lpips(a, b)


def test_metric_extract():
    rng = np.random.RandomState(1)
    est = rng.rand(64, 64, 3).astype(np.float32)
    orig = rng.rand(100, 100, 3).astype(np.float32)
    roi, orig_r = nm.extract(est, orig, (10, 40), (20, 50), rotation=5)
    assert roi.shape == (30, 30, 3)
    assert orig_r.shape == (30, 30, 3)


def test_remote_gated():
    from lenslesspicam_tpu.hardware import remote

    with pytest.raises(ImportError):
        remote.check_username_hostname("pi", "raspberrypi.local")


def test_fabrication_gated():
    from lenslesspicam_tpu.hardware.fabrication import Mask3DModel

    model = Mask3DModel(np.ones((8, 8)), (1e-2, 1e-2))
    with pytest.raises(ImportError):
        model.generate_3d_model()


def test_plot_smoke(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    from lenslesspicam_tpu.utils import plot as P

    rng = np.random.RandomState(2)
    img = rng.rand(1, 32, 32, 3).astype(np.float32)
    P.plot_image(img, gamma=2.2)
    P.pixel_histogram(img[0])
    P.plot_cross_section(img[0])
    P.plot_autocorr2d(img[0, :, :, 0])
    P.plot_autocorr_rgb(img[0])
    # compare_models round trip
    import json, os

    d = tmp_path / "model"
    d.mkdir()
    with open(d / "metrics.json", "w") as f:
        json.dump({"0": {"eval": {"PSNR": 10}}, "1": {"eval": {"PSNR": 12}}}, f)
    P.compare_models([str(d)])
