"""Aperture, plot, metric API, remote/fabrication gating."""

import os

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

    model = Mask3DModel(np.ones((8, 8)), (1e-2, 1e-2), height=0.3,
                        generate=False)
    with pytest.raises(ImportError):
        model.generate_3d_model()


def test_fabrication_geometry():
    """Connection/frame/mold geometry is computed in pure numpy
    (reference fabrication.py:110-135, 417-525) — checked offline
    without cadquery."""
    from lenslesspicam_tpu.hardware import fabrication as F

    # mask_to_points: binary masks extrude value-0 cells
    mask = np.ones((4, 4))
    mask[1, 2] = 0
    pts, heights = F.Mask3DModel.mask_to_points(mask, (0.5, 0.5))
    assert heights is None
    assert pts.shape == (1, 2)
    np.testing.assert_allclose(pts[0], [(1 - 2) * 0.5, (2 - 2) * 0.5])

    # graded (3-D) masks extrude nonzero cells at fractional height
    mask3 = np.zeros((4, 4))
    mask3[0, 0], mask3[2, 3] = 0.5, 1.0
    pts3, h3 = F.Mask3DModel.mask_to_points(mask3, (1.0, 1.0))
    assert pts3.shape == (2, 2) and sorted(h3) == [0.5, 1.0]

    # frame outline: padding vs explicit size
    assert F.SimpleFrame(padding=2.0).outline((10, 8)) == (14, 12, 10, 8)
    assert F.SimpleFrame(size=(20, 20)).outline((10, 8))[:2] == (20, 20)

    # cross bars span the full mask at the line width
    bars = F.CrossConnection(line_width=0.2).bars((10, 8))
    assert bars == [(0.2, 8.0), (10.0, 0.2)]

    # saltire: two corner-to-corner hexagons with width/sqrt(2) inset
    polys = F.SaltireConnection(line_width=0.2).polygons((10, 8))
    assert len(polys) == 2 and all(len(p) == 6 for p in polys)
    lw = 0.2 / np.sqrt(2)
    np.testing.assert_allclose(polys[0][0], (-(5 - lw), -4))
    np.testing.assert_allclose(polys[0][4], (5, 4))

    # three-point: half-width bar + two corner strips meeting the center
    bar, tp_polys = F.ThreePointConnection(line_width=0.2).geometry((10, 8))
    assert bar == (5.0, 0.2) and len(tp_polys) == 2
    np.testing.assert_allclose(tp_polys[0][-1], (lw, 0.0))

    # coded-aperture joints sit at cell-boundary crossings
    ca = np.kron(np.array([[1, 0], [0, 1]]), np.ones((4, 4)))
    joints = F.CodedApertureConnection().joint_points(ca, (8.0, 8.0))
    assert joints.shape == (1, 2)
    np.testing.assert_allclose(joints[0], [0.0, 0.0])

    # adapter friction-fit feasibility
    assert F.adapter_dimensions_ok(10, 8, 12.9, 9.9, 0.4)
    with pytest.raises(AssertionError):
        F.adapter_dimensions_ok(13, 8, 12.9, 9.9, 0.4)


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


def test_bench_baseline_and_roofline_model():
    """bench._baseline pixel scaling + the roofline traffic model tracks
    the declared dtype knobs."""
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    # linear pixel scaling of the A5000 reference
    b12 = bench._baseline((3040, 4056))
    b3 = bench._baseline((1520, 2028))
    np.testing.assert_allclose(b3 / b12, 4.0, rtol=1e-6)

    from lenslesspicam_tpu.utils.tracing import fused_admm_bytes_per_iter

    shape = (1, 6144, 8192)
    full_f32, _, _ = fused_admm_bytes_per_iter(shape, io_bytes=4,
                                               half_spectrum=False)
    full_bf16, _, _ = fused_admm_bytes_per_iter(shape, io_bytes=2,
                                                half_spectrum=False)
    half_bf16, _, f32_part = fused_admm_bytes_per_iter(shape, io_bytes=2,
                                                       half_spectrum=True)
    assert full_bf16 < full_f32
    assert half_bf16 < full_bf16
    assert f32_part > 0  # f32 carries tracked in the 4-byte term
    # bf16 carries shrink it further
    old = os.environ.get("LPT_CARRY_IO")
    try:
        os.environ["LPT_CARRY_IO"] = "bf16"
        half_bf16_c, _, _ = fused_admm_bytes_per_iter(shape, io_bytes=2,
                                                      half_spectrum=True)
    finally:
        if old is None:
            os.environ.pop("LPT_CARRY_IO", None)
        else:
            os.environ["LPT_CARRY_IO"] = old
    assert half_bf16_c < half_bf16
    # int16 TV carries shrink the 4-byte term
    old_tv = os.environ.get("LPT_CARRY_TV")
    try:
        os.environ["LPT_CARRY_TV"] = "i16"
        _, _, f32_i16 = fused_admm_bytes_per_iter(shape, io_bytes=2,
                                                  half_spectrum=True)
    finally:
        if old_tv is None:
            os.environ.pop("LPT_CARRY_TV", None)
        else:
            os.environ["LPT_CARRY_TV"] = old_tv
    assert f32_i16 < f32_part
