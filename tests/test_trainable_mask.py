"""Trainable masks, SLM model, PnP solvers, mask co-optimization."""

import numpy as np
import jax
import jax.numpy as jnp

from lenslesspicam_tpu.hardware.trainable_mask import (
    AdafruitLCD,
    TrainableCodedAperture,
    TrainablePSF,
    prep_trainable_mask,
)
from lenslesspicam_tpu.hardware.slm import build_layout, get_programmable_mask
from lenslesspicam_tpu.hardware.sensor import VirtualSensor


def test_trainable_psf():
    rng = np.random.RandomState(0)
    psf0 = rng.rand(1, 24, 32, 3).astype(np.float32)
    mask = TrainablePSF(psf0)
    psf = mask.get_psf(mask.params)
    np.testing.assert_allclose(np.asarray(psf), psf0, atol=1e-6)
    # projection clamps
    dirty = {"psf": jnp.asarray(psf0) * 3 - 1}
    clean = mask.project(dirty)
    assert float(clean["psf"].min()) >= 0 and float(clean["psf"].max()) <= 1


def test_slm_layout_and_mask():
    sensor = VirtualSensor.from_name("rpi_hq", downsample=16)
    vals = jnp.asarray(np.random.RandomState(1).rand(12, 15).astype(np.float32))
    layout = build_layout(vals.shape, sensor)
    mask = get_programmable_mask(vals, layout)
    assert mask.shape == (3,) + tuple(sensor.resolution)
    assert float(mask.max()) > 0


def test_adafruit_lcd_psf_and_grad():
    rng = np.random.RandomState(2)
    vals = rng.rand(10, 12).astype(np.float32)
    mask = AdafruitLCD(vals, sensor="rpi_hq", downsample=32,
                       scene2mask=0.3, mask2sensor=0.002)
    psf = mask.get_psf(mask.params)
    assert psf.ndim == 4 and psf.shape[0] == 1 and psf.shape[-1] == 3
    np.testing.assert_allclose(float(jnp.linalg.norm(psf.ravel())), 1.0, rtol=1e-4)

    # differentiability through the full mask -> PSF chain
    def loss(p):
        return jnp.sum(mask.get_psf(p) ** 2)

    g = jax.grad(loss)(mask.params)
    assert np.abs(np.asarray(g["vals"])).max() > 0


def test_trainable_coded_aperture():
    mask = TrainableCodedAperture(downsample=32, binary=True)
    psf = mask.get_psf(mask.params)
    assert psf.shape[-1] == 3
    proj = mask.project({k: v * 0.6 for k, v in mask.params.items()})
    for v in proj.values():
        assert set(np.unique(np.asarray(v))).issubset({0.0, 1.0})


def test_prep_trainable_mask():
    psf = np.random.RandomState(3).rand(1, 16, 20, 3).astype(np.float32)
    m = prep_trainable_mask({"mask_type": "TrainablePSF"}, psf=psf)
    assert isinstance(m, TrainablePSF)
    assert prep_trainable_mask({}) is None


def test_pnp_admm():
    from lenslesspicam_tpu.recon import admm

    rng = np.random.RandomState(4)
    psf = rng.rand(1, 24, 32, 3).astype(np.float32)
    psf /= np.linalg.norm(psf)
    data = rng.rand(24, 32, 3).astype(np.float32)
    conv = admm.make_convolver(psf)

    def denoiser(x, noise_level):
        return jnp.clip(x, 0.0, None)  # trivial prox as denoiser

    for use_dual in (False, True):
        out = jax.jit(
            lambda d: admm.run_pnp(conv, d, denoiser, n_iter=5, use_dual=use_dual)
        )(jnp.asarray(data))
        assert out.shape == (1, 1, 24, 32, 3)
        assert np.isfinite(np.asarray(out)).all()


def test_trainer_with_trainable_mask():
    """Mask co-optimization: mask params update and stay feasible."""
    from lenslesspicam_tpu.models.trainable_recon import TrainableRecon
    from lenslesspicam_tpu.models.unrolled import UnrolledADMM
    from lenslesspicam_tpu.train.trainer import Trainer, TrainerConfig

    rng = np.random.RandomState(5)
    psf = rng.rand(1, 16, 24, 3).astype(np.float32)
    psf /= np.linalg.norm(psf)
    mask = TrainablePSF(psf, lr=1e-2)
    before = np.asarray(mask.params["psf"]).copy()

    batches = [{
        "lensless": rng.rand(2, 1, 16, 24, 3).astype(np.float32),
        "lensed": rng.rand(2, 1, 16, 24, 3).astype(np.float32),
    } for _ in range(2)]

    model = TrainableRecon(camera_inversion=UnrolledADMM(n_iter=2))
    cfg = TrainerConfig(epochs=1, lr=1e-3, l1_mask=1e-4)
    trainer = Trainer(model, psf, lambda: iter(batches), batches[:1], cfg, mask=mask)
    loss = trainer.train_epoch()
    assert np.isfinite(loss)
    after = np.asarray(mask.params["psf"])
    assert not np.allclose(before, after), "mask params did not update"
    assert after.min() >= 0 and after.max() <= 1, "projection not applied"
