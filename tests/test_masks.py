"""Mask designs + Tikhonov + APGD — mirrors reference test/test_masks.py
(shape contracts + phase-retrieval quality) and adds solver checks."""

import numpy as np
import pytest
import jax.numpy as jnp

from conftest import reference_available, add_reference_to_path, stub_reference_mask_deps
from lenslesspicam_tpu.hardware.mask import (
    CodedAperture,
    FresnelZoneAperture,
    MultiLensArray,
    PhaseContour,
    phase_retrieval,
)
from lenslesspicam_tpu.recon.tikhonov import CodedApertureReconstruction
from lenslesspicam_tpu.recon import apgd as japgd

RES = (64, 80)
D_SENSOR = 4e-3
FEATURE = 30e-6  # larger features for small test masks


def test_coded_aperture_mls():
    mask = CodedAperture(method="MLS", n_bits=4, resolution=RES,
                         feature_size=FEATURE, distance_sensor=D_SENSOR)
    assert mask.mask.shape == RES
    assert set(np.unique(mask.mask)).issubset({0.0, 1.0})
    assert mask.psf.shape == RES + (3,)
    assert np.isfinite(np.asarray(mask.psf)).all()


def test_coded_aperture_mura():
    mask = CodedAperture(method="MURA", n_bits=5, resolution=RES,
                         feature_size=FEATURE, distance_sensor=D_SENSOR)
    assert mask.mask.shape == RES
    assert mask.psf is not None


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("p", [5, 7, 11, 13])
def test_mura_pattern_golden(p):
    add_reference_to_path()
    stub_reference_mask_deps()
    from lensless.hardware.mask import CodedAperture as RefCA

    ours = CodedAperture(method="MURA", n_bits=p, resolution=(p, p),
                         feature_size=FEATURE)
    ref = RefCA(method="MURA", n_bits=p, resolution=(p, p), feature_size=FEATURE)
    np.testing.assert_array_equal(np.asarray(ours.mask), np.asarray(ref.mask))


def test_fza():
    mask = FresnelZoneAperture(radius=0.5e-3, resolution=RES,
                               feature_size=FEATURE, distance_sensor=D_SENSOR)
    assert mask.mask.shape == RES
    assert set(np.unique(mask.mask)).issubset({0.0, 1.0})


def test_multi_lens_array():
    mask = MultiLensArray(N=10, resolution=RES, feature_size=FEATURE,
                          distance_sensor=D_SENSOR, seed=1)
    assert mask.height_map.shape == RES
    assert mask.height_map.min() >= mask.min_height
    assert len(mask.focal_length) == len(mask.radius)


def test_phase_contour_and_retrieval_quality():
    """Reference quality test (test_masks.py:38-56): re-propagating the
    retrieved phase must reproduce the target PSF."""
    from lenslesspicam_tpu.ops.propagation import fresnel_conv

    mask = PhaseContour(noise_period=(8, 8), n_iter=10, resolution=RES,
                        feature_size=FEATURE, distance_sensor=D_SENSOR)
    assert mask.height_map.shape == RES
    assert mask.psf is not None

    wv = mask.design_wv
    field = mask.height_map_to_field(wv)
    prop = fresnel_conv(jnp.asarray(field, jnp.complex64), wv,
                        (FEATURE, FEATURE), D_SENSOR)
    psf = np.abs(np.asarray(prop)) ** 2
    target = mask.target_psf / mask.target_psf.max() if mask.target_psf.max() else mask.target_psf
    psf_n = psf / psf.max()
    mse = float(np.mean((psf_n - target) ** 2))
    assert mse < 0.1, mse


def test_from_sensor():
    mask = CodedAperture.from_sensor("rpi_hq", downsample=16, method="MLS",
                                     n_bits=4, distance_sensor=D_SENSOR)
    assert mask.mask.shape == (190, 253)


def test_separable_simulate_and_tikhonov():
    rng = np.random.RandomState(0)
    mask = CodedAperture(method="MLS", n_bits=4, resolution=(32, 32),
                         feature_size=FEATURE)
    obj = np.zeros((24, 24, 3), np.float32)
    obj[8:16, 8:16, :] = 1.0
    meas = np.asarray(mask.simulate(jnp.asarray(obj), snr_db=None))
    assert meas.shape == (32, 32, 3)

    recon = CodedApertureReconstruction(mask, obj.shape, lmbd=3e-4)
    est = np.asarray(recon.apply(meas))
    assert est.shape == obj.shape
    assert est.min() >= 0 and est.max() <= 1
    # the bright square should be recovered brighter than the borders
    assert est[8:16, 8:16].mean() > 3 * est[:4, :4].mean()


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_tikhonov_golden():
    add_reference_to_path()
    stub_reference_mask_deps()
    from lensless.recon.tikhonov import CodedApertureReconstruction as RefTik
    from lensless.hardware.mask import CodedAperture as RefCA

    rng = np.random.RandomState(1)
    # native MLS size (15x15 for n_bits=4) avoids the reference's
    # numpy-resize path, which crashes without torchvision
    ref_mask = RefCA(method="MLS", n_bits=4, resolution=(15, 15), feature_size=FEATURE)
    meas = rng.rand(15, 15, 3).astype(np.float32)

    ref_recon = RefTik(ref_mask, (12, 12, 3), lmbd=3e-4)
    ref_out = ref_recon.apply(meas.copy())

    ours_mask = CodedAperture(method="MLS", n_bits=4, resolution=(15, 15),
                              feature_size=FEATURE)
    np.testing.assert_array_equal(ours_mask.mask, np.asarray(ref_mask.mask))
    recon = CodedApertureReconstruction(ours_mask, (12, 12, 3), lmbd=3e-4)
    out = np.asarray(recon.apply(meas))
    np.testing.assert_allclose(out, ref_out, atol=1e-3)


def test_apgd_runs():
    rng = np.random.RandomState(2)
    psf = rng.rand(1, 32, 40, 3).astype(np.float32)
    psf /= np.linalg.norm(psf)
    data = rng.rand(32, 40, 3).astype(np.float32)
    conv = japgd.make_convolver(psf)
    out = np.asarray(japgd.run(conv, data, n_iter=20))
    assert out.shape == (1, 1, 32, 40, 3)
    assert (out >= 0).all()
    out_l1 = np.asarray(japgd.run(conv, data, n_iter=20,
                                  prox_penalty=japgd.APGDPriors.L1,
                                  diff_penalty=japgd.APGDPriors.L2))
    assert np.isfinite(out_l1).all()


def test_apgd_downsampling_composition():
    """img_shape downsampling: measurement at half resolution, recon at
    the PSF grid (reference apgd.py:154-175 SubSample composition)."""
    rng = np.random.RandomState(3)
    psf = rng.rand(1, 32, 40, 3).astype(np.float32)
    psf /= np.linalg.norm(psf)
    meas = rng.rand(16, 20, 3).astype(np.float32)
    out = np.asarray(japgd.apgd(psf, meas, n_iter=10, img_shape=(16, 20)))
    assert out.shape == (1, 1, 32, 40, 3)
    assert np.isfinite(out).all()

    # adjoint consistency of the subsampling pair: <S x, y> == <x, S* y>
    import jax.numpy as jnp
    x = jnp.asarray(rng.rand(1, 1, 32, 40, 3).astype(np.float32))
    y = jnp.asarray(rng.rand(1, 1, 16, 20, 3).astype(np.float32))
    sx = japgd._subsample(x, (2, 2))
    sty = japgd._subsample_adj(y, (2, 2), (32, 40))
    np.testing.assert_allclose(float((sx * y).sum()), float((x * sty).sum()),
                               rtol=1e-5)


def test_apgd_rel_error_stop():
    """RelError stopping: a loose tolerance stops earlier than MaxIter
    yet matches the no-stop solver on converged problems."""
    rng = np.random.RandomState(4)
    psf = rng.rand(1, 24, 32, 1).astype(np.float32)
    psf /= np.linalg.norm(psf)
    data = rng.rand(24, 32, 1).astype(np.float32)
    conv = japgd.make_convolver(psf)
    full = np.asarray(japgd.run(conv, data, n_iter=300))
    stopped = np.asarray(japgd.run(conv, data, n_iter=300, rel_error=1e-4))
    assert np.isfinite(stopped).all()
    scale = max(abs(full).max(), 1e-9)
    assert abs(stopped - full).max() / scale < 5e-2
