"""Data layer: io golden parity vs reference, image utils, sensor,
far-field simulator."""

import os

import numpy as np
import pytest
import cv2

from conftest import reference_available, add_reference_to_path
from lenslesspicam_tpu.data import io as jio
from lenslesspicam_tpu.data import image as jimage
from lenslesspicam_tpu.hardware.sensor import VirtualSensor, sensor_dict
from lenslesspicam_tpu.data.simulation import FarFieldSimulator


@pytest.fixture
def sample_files(tmp_path):
    rng = np.random.RandomState(0)
    psf_img = (rng.rand(48, 64, 3) * 200 + 10).astype(np.uint8)
    data_img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    psf_fp = str(tmp_path / "psf.png")
    data_fp = str(tmp_path / "data.png")
    cv2.imwrite(psf_fp, psf_img)
    cv2.imwrite(data_fp, data_img)
    return psf_fp, data_fp


def test_load_psf_contract(sample_files):
    psf_fp, _ = sample_files
    psf = jio.load_psf(psf_fp, downsample=2)
    assert psf.ndim == 4 and psf.shape == (1, 24, 32, 3)
    assert psf.dtype == np.float32
    np.testing.assert_allclose(np.linalg.norm(psf.ravel()), 1.0, rtol=1e-5)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_load_psf_golden(sample_files):
    add_reference_to_path()
    from lensless.utils.io import load_psf as ref_load_psf

    psf_fp, _ = sample_files
    ref = ref_load_psf(psf_fp, downsample=1, bg_pix=(2, 10))
    ours = jio.load_psf(psf_fp, downsample=1, bg_pix=(2, 10))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_load_data_golden(sample_files):
    add_reference_to_path()
    from lensless.utils.io import load_data as ref_load_data

    psf_fp, data_fp = sample_files
    ref_psf, ref_data = ref_load_data(psf_fp, data_fp, downsample=1, plot=False)
    psf, data = jio.load_data(psf_fp, data_fp, downsample=1)
    np.testing.assert_allclose(psf, ref_psf, atol=1e-5)
    np.testing.assert_allclose(data, ref_data, atol=1e-4)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_image_utils_golden():
    add_reference_to_path()
    import lensless.utils.image as ref_image

    rng = np.random.RandomState(1)
    img = rng.rand(1, 32, 40, 3).astype(np.float32)

    # rgb2gray numpy parity
    ours = jimage.rgb2gray(img[0])
    theirs = ref_image.rgb2gray(img[0])
    np.testing.assert_allclose(ours, theirs, atol=1e-6)

    # gamma correction parity
    vals = rng.rand(16, 16)
    np.testing.assert_allclose(
        jimage.gamma_correction(vals, 2.2), ref_image.gamma_correction(vals, 2.2),
        atol=1e-6,
    )


def test_resize_roundtrip():
    rng = np.random.RandomState(2)
    img = rng.rand(1, 32, 40, 3).astype(np.float32)
    small = jimage.resize(img, factor=0.5)
    assert small.shape == (1, 16, 20, 3)
    assert small.min() >= img.min() and small.max() <= img.max()


def test_bayer_roundtrip():
    rng = np.random.RandomState(3)
    rgb = (rng.rand(32, 40, 3) * 255).astype(np.uint8)
    bayer = jimage.rgb2bayer(rgb)
    assert bayer.shape == (16, 20, 4)
    back = jimage.bayer2rgb(bayer)
    assert back.shape == (16, 20, 3)


def test_save_image_roundtrip(tmp_path):
    rng = np.random.RandomState(4)
    img = rng.rand(1, 24, 32, 3).astype(np.float32)
    fp = str(tmp_path / "out.png")
    jio.save_image(img, fp)
    loaded = cv2.imread(fp)
    assert loaded.shape == (24, 32, 3)


def test_virtual_sensor():
    s = VirtualSensor.from_name("rpi_hq", downsample=8)
    assert tuple(s.resolution) == (380, 507)
    scene = np.random.rand(100, 150, 3).astype(np.float32)
    img = s.capture(scene)
    assert img.shape == (380, 507, 3)
    assert img.dtype == np.uint8


def test_far_field_simulator():
    rng = np.random.RandomState(5)
    psf = rng.rand(1, 64, 96, 3).astype(np.float32)
    psf /= np.linalg.norm(psf)
    sensor = VirtualSensor.from_name("rpi_hq", downsample=48)
    sim = FarFieldSimulator(
        object_height=0.3, scene2mask=0.55, mask2sensor=0.004,
        sensor=sensor, psf=psf, snr_db=20, quantize=True,
    )
    obj = rng.rand(32, 48, 3).astype(np.float32)
    meas, obj_plane = sim.propagate_image(obj, return_object_plane=True)
    assert obj_plane.shape[-1] == 3
    assert np.asarray(meas).min() >= 0
    assert np.asarray(meas).max() <= 255


def test_far_field_simulator_no_psf():
    sensor = VirtualSensor.from_name("rpi_hq", downsample=48)
    sim = FarFieldSimulator(object_height=0.3, scene2mask=0.55,
                            mask2sensor=0.004, sensor=sensor)
    obj = np.random.RandomState(6).rand(32, 48, 3).astype(np.float32)
    out = sim.propagate_image(obj)
    assert out.shape[-1] == 3


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_bayer2rgb_cc_golden():
    """ISP chain numerically identical to the reference on synthetic
    Bayer data (reference image.py:281-349)."""
    add_reference_to_path()
    from lensless.utils.image import bayer2rgb_cc as ref_isp

    rng = np.random.RandomState(21)
    bayer12 = (rng.rand(64, 96) * (2**12 - 1)).astype(np.uint16)

    for kwargs in (
        dict(nbits=12),
        dict(nbits=12, nbits_out=8),
        dict(nbits=12, red_gain=1.8, blue_gain=1.3),
        dict(nbits=12, down=2),
        dict(nbits=12, black_level=100.0, nbits_out=16),
    ):
        ours = jimage.bayer2rgb_cc(bayer12.copy(), **kwargs)
        ref = ref_isp(bayer12.copy(), **kwargs)
        assert ours.dtype == ref.dtype
        # same chain up to uint rounding
        np.testing.assert_allclose(
            ours.astype(np.float64), ref.astype(np.float64), atol=1.0)
