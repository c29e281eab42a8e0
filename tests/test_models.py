"""Model families: UNetRes, MultiWiener, TrainableInversion, SVDeconvNet,
CompensationBranch, and the TrainableRecon composition."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lenslesspicam_tpu.models.unet import UNetRes, UNet, drunet_denoise
from lenslesspicam_tpu.models.unrolled import UnrolledADMM, UnrolledFISTA
from lenslesspicam_tpu.models.inversion import TrainableInversion, SVDeconvNet
from lenslesspicam_tpu.models.multi_wiener import MultiWiener
from lenslesspicam_tpu.models.compensation import CompensationBranch
from lenslesspicam_tpu.models.trainable_recon import TrainableRecon

SMALL_NC = (4, 8, 16, 32)


def _problem(shape=(1, 32, 40, 3), batch=2, seed=0):
    rng = np.random.RandomState(seed)
    psf = rng.rand(*shape).astype(np.float32)
    psf /= np.linalg.norm(psf)
    data = rng.rand(batch, *shape).astype(np.float32)
    return jnp.asarray(psf), jnp.asarray(data)


def test_unetres_shapes():
    model = UNetRes(out_nc=3, nc=SMALL_NC, nb=1)
    x = jnp.zeros((2, 32, 40, 4))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 32, 40, 3)


def test_unetres_background_subtraction():
    model = UNetRes(out_nc=3, nc=SMALL_NC, nb=1, background_subtraction=True)
    x = jnp.zeros((1, 32, 40, 4))
    bg = jnp.zeros((1, 32, 40, 4))
    params = model.init(jax.random.PRNGKey(0), x, background=bg)
    out = model.apply(params, x, background=bg)
    assert out.shape == (1, 32, 40, 3)


def test_unet_residual():
    model = UNet(out_nc=3, nc=SMALL_NC, nb=1)
    x = jnp.ones((1, 32, 40, 3)) * 0.5
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 32, 40, 3)


def test_drunet_denoise_odd_size():
    model = UNetRes(out_nc=3, nc=SMALL_NC, nb=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 40, 40, 4)))
    img = jnp.ones((1, 33, 37, 3)) * 0.3
    out = drunet_denoise(model, params, img, noise_level=10)
    assert out.shape == (1, 33, 37, 3)


def test_trainable_inversion():
    psf, data = _problem()
    model = TrainableInversion()
    conv = TrainableInversion.make_convolver(psf)
    params = model.init(jax.random.PRNGKey(0), conv, data)
    out = model.apply(params, conv, data)
    assert out.shape == data.shape
    assert float(jnp.min(out)) >= 0


def test_sv_deconvnet():
    psf, data = _problem()
    model = SVDeconvNet(K=2)
    conv = TrainableInversion.make_convolver(psf)
    params = model.init(jax.random.PRNGKey(0), conv, data, psf)
    out = model.apply(params, conv, data, psf)
    assert out.shape == data.shape
    assert "multipsf" in params["params"]
    assert params["params"]["multipsf"].shape == (4, 32, 40, 3)


def test_multi_wiener():
    psf, data = _problem((1, 32, 40, 3))
    model = MultiWiener(in_channels=3, out_channels=3, psf_channels=3, nc=(4, 8, 16, 16, 16))
    vars_ = model.init(jax.random.PRNGKey(0), data, psf)
    out = model.apply(vars_, data, psf)
    assert out.shape == data.shape
    assert float(jnp.min(out)) >= 0


def test_compensation_branch():
    nc = (4, 8, 16)
    model = CompensationBranch(nc=nc)
    inputs = [jnp.ones((2, 1, 32, 40, 3))] * 3
    vars_ = model.init(jax.random.PRNGKey(0), inputs)
    out = model.apply(vars_, inputs)
    # 3 pool stages of 2 -> 32/8 x 40/8
    assert out.shape == (2, 4, 5, nc[-1])


@pytest.mark.parametrize("inversion", ["admm", "fista"])
def test_trainable_recon_composition(inversion):
    psf, data = _problem((1, 32, 40, 3))
    inv = UnrolledADMM(n_iter=3) if inversion == "admm" else UnrolledFISTA(n_iter=3)
    model = TrainableRecon(
        camera_inversion=inv,
        pre_process=UNetRes(out_nc=3, nc=SMALL_NC, nb=1),
        post_process=UNetRes(out_nc=3, nc=SMALL_NC, nb=1),
    )
    params = model.init(jax.random.PRNGKey(0), data, psf)
    out = model.apply(params, data, psf)
    assert out.shape == data.shape
    # noise-level params exist for both processors
    assert "pre_block" in params["params"] and "post_block" in params["params"]


def test_trainable_recon_psf_network_grads():
    psf, data = _problem((1, 32, 40, 3))
    target = jnp.asarray(np.random.RandomState(7).rand(*data.shape).astype(np.float32))
    model = TrainableRecon(
        camera_inversion=UnrolledADMM(n_iter=2),
        psf_network=UNetRes(out_nc=3, nc=SMALL_NC, nb=1),
    )
    params = model.init(jax.random.PRNGKey(0), data, psf)

    def loss_fn(p):
        return jnp.mean((model.apply(p, data, psf) - target) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(float(loss)) and gnorm > 0


def test_trainable_recon_direct_background():
    psf, data = _problem((1, 32, 40, 3))
    bg = jnp.ones_like(data) * 0.1
    model = TrainableRecon(camera_inversion=UnrolledADMM(n_iter=2),
                           direct_background_subtraction=True)
    params = model.init(jax.random.PRNGKey(0), data, psf, background=bg)
    out = model.apply(params, data, psf, background=bg)
    assert out.shape == data.shape


def test_trainable_recon_compensation():
    psf, data = _problem((1, 32, 40, 3))
    n_iter = 3
    model = TrainableRecon(
        camera_inversion=UnrolledADMM(n_iter=n_iter),
        post_process=UNetRes(out_nc=3, nc=SMALL_NC, nb=1, concatenate_compensation=True),
        compensation_branch=CompensationBranch(nc=(4, 8, 16)[:n_iter]),
    )
    params = model.init(jax.random.PRNGKey(0), data, psf)
    out = model.apply(params, data, psf)
    assert out.shape == data.shape


def test_trainable_recon_per_sample_psfs():
    psf, data = _problem((1, 32, 40, 3))
    psfs = jnp.stack([psf, psf * 1.1])  # (B, D, H, W, C)
    model = TrainableRecon(camera_inversion=UnrolledADMM(n_iter=2))
    params = model.init(jax.random.PRNGKey(0), data, psfs)
    out = model.apply(params, data, psfs)
    assert out.shape == data.shape


def test_integrated_background_subtraction():
    from lenslesspicam_tpu.models.background import IntegratedBackgroundSub

    psf, data = _problem((1, 32, 40, 3))
    bg = jnp.ones_like(data) * 0.1
    model = TrainableRecon(
        camera_inversion=UnrolledADMM(n_iter=2),
        pre_process=IntegratedBackgroundSub(nc=SMALL_NC, nb=1),
        integrated_background_subtraction=True,
    )
    params = model.init(jax.random.PRNGKey(0), data, psf, background=bg)
    out = model.apply(params, data, psf, background=bg)
    assert out.shape == data.shape
