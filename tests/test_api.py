"""High-level API: reference-style three-step protocol, across
gray/RGB x float32 x {2D, 3D}, mirroring test/test_algos.py smoke coverage."""

import numpy as np
import pytest
import jax.numpy as jnp

import lenslesspicam_tpu as lpt


def _problem(shape=(1, 32, 40, 3), seed=0):
    rng = np.random.RandomState(seed)
    psf = rng.rand(*shape).astype(np.float32)
    psf /= np.linalg.norm(psf)
    data = rng.rand(*shape[1:]).astype(np.float32)
    return psf, data


ALGOS = [lpt.ADMM, lpt.GradientDescent, lpt.NesterovGradientDescent, lpt.FISTA]


@pytest.mark.parametrize("algo", ALGOS)
@pytest.mark.parametrize("channels", [1, 3])
def test_smoke(algo, channels):
    psf, data = _problem((1, 32, 40, channels))
    recon = algo(psf)
    recon.set_data(data)
    out = recon.apply(n_iter=5)
    assert out.shape == (1, 32, 40, channels)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("algo", ALGOS)
def test_3d(algo):
    psf, _ = _problem((3, 24, 32, 1), seed=1)
    data = np.random.RandomState(2).rand(24, 32, 1).astype(np.float32)
    recon = algo(psf)
    recon.set_data(data)
    out = recon.apply(n_iter=3)
    assert out.shape == (3, 24, 32, 1)


@pytest.mark.parametrize("algo", ALGOS)
def test_batch_apply(algo):
    psf, _ = _problem()
    batch = np.random.RandomState(3).rand(2, 1, 32, 40, 3).astype(np.float32)
    recon = algo(psf)
    out = recon.batch_apply(batch, n_iter=3)
    assert out.shape == (2, 1, 32, 40, 3)
    single = recon.batch_apply(batch[:1], n_iter=3)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(single[0]), atol=1e-5)


def test_iteration_sweep_no_recompile():
    """Dynamic n_iter: more iterations should not trigger recompilation
    (hard to assert directly; assert results differ and run fast)."""
    psf, data = _problem()
    recon = lpt.ADMM(psf)
    recon.set_data(data)
    outs = [np.asarray(recon.apply(n_iter=n)) for n in (1, 5, 10)]
    assert not np.allclose(outs[0], outs[2])


def test_reconstruction_error():
    psf, data = _problem()
    recon = lpt.ADMM(psf)
    recon.set_data(data)
    out = recon.apply(n_iter=5)
    err = recon.reconstruction_error(out, data[None, None])
    assert err.shape == (1,)
    assert np.isfinite(float(err[0]))


def test_initial_estimate_warm_start():
    psf, data = _problem()
    recon = lpt.FISTA(psf)
    recon.set_data(data)
    base = np.asarray(recon.apply(n_iter=3))
    warm = lpt.FISTA(psf, initial_est=np.zeros((1, 32, 40, 3), np.float32))
    warm.set_data(data)
    out = np.asarray(warm.apply(n_iter=3))
    assert out.shape == base.shape
    assert not np.allclose(out, base)  # different init -> different trajectory


def test_apply_disp_iter_exact_continuation():
    """apply(disp_iter=k) chunks with EXACT state continuation: the
    chunked result equals a single run, with callbacks at each chunk
    (reference recon.py apply's progress display)."""
    import lenslesspicam_tpu as lpt

    rng = np.random.RandomState(0)
    psf = rng.rand(1, 32, 40, 3).astype(np.float32)
    psf /= np.linalg.norm(psf)
    data = rng.rand(1, 1, 32, 40, 3).astype(np.float32)

    for cls in (lpt.ADMM, lpt.FISTA, lpt.GradientDescent,
                lpt.NesterovGradientDescent):
        r = cls(psf)
        r.set_data(data)
        full = np.asarray(r.apply(n_iter=12))
        seen = []
        r2 = cls(psf)
        r2.set_data(data)
        chunked = np.asarray(r2.apply(
            n_iter=12, disp_iter=5, callback=lambda img, it: seen.append(it)))
        err = np.abs(full - chunked).max() / max(np.abs(full).max(), 1e-9)
        assert err < 1e-5, (cls.__name__, err)
        assert seen == [5, 10, 12]
