"""Golden parity: our jit solvers vs the reference numpy implementations.

Synthetic PSF/measurement; the measurement is generated through the
reference forward model so the solvers run in a realistic regime.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from conftest import reference_available, add_reference_to_path
from lenslesspicam_tpu.recon import admm as jadmm
from lenslesspicam_tpu.recon import gd as jgd

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")


def _problem(shape=(1, 32, 40, 3), seed=0):
    rng = np.random.RandomState(seed)
    psf = rng.rand(*shape).astype(np.float32)
    psf /= np.linalg.norm(psf)
    data = rng.rand(*shape[1:]).astype(np.float32)
    return psf, data


@pytest.mark.parametrize("shape", [(1, 32, 40, 3), (1, 33, 27, 1)])
@pytest.mark.parametrize("n_iter", [1, 5, 20])
def test_admm_golden(shape, n_iter):
    add_reference_to_path()
    from lensless.recon.admm import ADMM

    psf, data = _problem(shape)
    ref = ADMM(psf.copy())
    ref.set_data(data.copy())
    ref_out = ref.apply(n_iter=n_iter, plot=False)

    conv = jadmm.make_convolver(psf)
    out = np.asarray(jadmm.run_jit(conv, data, n_iter=n_iter))[0]
    assert out.shape == ref_out.shape  # reference apply() drops batch dim
    np.testing.assert_allclose(out, ref_out, atol=1e-4)


@pytest.mark.parametrize("method,ref_cls", [
    ("vanilla", "GradientDescent"),
    ("nesterov", "NesterovGradientDescent"),
    ("fista", "FISTA"),
])
def test_gd_golden(method, ref_cls):
    add_reference_to_path()
    import lensless.recon.gd as ref_gd

    psf, data = _problem((1, 32, 40, 3), seed=1)
    ref = getattr(ref_gd, ref_cls)(psf.copy())
    ref.set_data(data.copy())
    ref_out = ref.apply(n_iter=10, plot=False)

    conv = jgd.make_convolver(psf)
    out = np.asarray(jgd.run(conv, psf, data, n_iter=10, method=method))[0]
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=1e-4)


def test_gd_3d_golden():
    """3-D PSF stack flows through GD (depth broadcast), matching reference."""
    add_reference_to_path()
    import lensless.recon.gd as ref_gd

    rng = np.random.RandomState(2)
    psf = rng.rand(4, 24, 32, 3).astype(np.float32)
    psf /= np.linalg.norm(psf)
    data = rng.rand(24, 32, 3).astype(np.float32)

    ref = ref_gd.FISTA(psf.copy())
    ref.set_data(data.copy())
    ref_out = ref.apply(n_iter=5, plot=False)

    conv = jgd.make_convolver(psf)
    out = np.asarray(jgd.run(conv, psf, data, n_iter=5, method="fista"))[0]
    assert out.shape == ref_out.shape == (4, 24, 32, 3)
    np.testing.assert_allclose(out, ref_out, atol=1e-4)


def test_admm_3d_runs():
    """New capability: 3-D ADMM (reference raises NotImplementedError)."""
    rng = np.random.RandomState(3)
    psf = rng.rand(4, 24, 32, 3).astype(np.float32)
    psf /= np.linalg.norm(psf)
    data = rng.rand(24, 32, 3).astype(np.float32)
    conv = jadmm.make_convolver(psf)
    out = np.asarray(jadmm.run_jit(conv, data, n_iter=5))
    assert out.shape == (1, 4, 24, 32, 3)
    assert np.isfinite(out).all() and (out >= 0).all()


def test_admm_batched_consistency():
    """Batched run == per-sample runs (reference test_algos.py invariant)."""
    psf, _ = _problem()
    rng = np.random.RandomState(4)
    batch = rng.rand(3, 1, 32, 40, 3).astype(np.float32)
    conv = jadmm.make_convolver(psf)
    full = np.asarray(jadmm.run_jit(conv, batch, n_iter=5))
    for b in range(3):
        single = np.asarray(jadmm.run_jit(conv, batch[b], n_iter=5))
        np.testing.assert_allclose(full[b], single[0], atol=1e-5)


def test_admm_carry_rebuild_warm_start_zero_duals():
    """One carry-rebuild step from a nonzero initial estimate must equal
    the textbook update with explicit zero duals (recon/admm.py carry
    initializers encode xi = eta = rho = 0)."""
    import jax.numpy as jnp

    from lenslesspicam_tpu.ops.tv import (finite_diff, finite_diff_adj,
                                          soft_thresh)
    from lenslesspicam_tpu.recon import admm

    rng = np.random.RandomState(3)
    psf = rng.rand(1, 24, 32, 1).astype(np.float32)
    psf /= np.linalg.norm(psf)
    data = rng.rand(1, 1, 24, 32, 1).astype(np.float32)
    conv = admm.make_convolver(psf)
    init = np.asarray(conv.pad_input(
        jnp.asarray(rng.rand(1, 1, 24, 32, 1), jnp.float32)))[0]

    params = admm.ADMMParams()
    pre = admm.precompute(conv, jnp.asarray(data), params)
    state = admm.init_state(conv, 1, jnp.asarray(init), params)
    out = admm.step(state, conv, pre, params)

    # textbook update with explicit zero duals
    mu1, mu2, mu3, tau = params.mu1, params.mu2, params.mu3, params.tau
    ph, pw = conv.padded_spatial_shape
    img0 = jnp.broadcast_to(jnp.asarray(init), (1,) + conv.padded_shape)
    fwd0 = conv.convolve(img0)
    psi0 = finite_diff(img0)
    U = soft_thresh(psi0, tau / mu2)
    X = pre.X_divmat * (mu1 * fwd0 + pre.data_pad)
    W = jnp.maximum(img0, 0.0)
    rk = (mu3 * W) + finite_diff_adj(mu2 * U)
    F_rk = (jnp.fft.rfft2(rk, axes=(-3, -2))
            + jnp.conj(conv.H) * jnp.fft.rfft2(mu1 * X, axes=(-3, -2)))
    F_img = pre.R_divmat * F_rk
    img_ref = jnp.fft.irfft2(F_img, s=(ph, pw), axes=(-3, -2))

    np.testing.assert_allclose(np.asarray(out.image_est),
                               np.asarray(img_ref), rtol=1e-5, atol=1e-6)
