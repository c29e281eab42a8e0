"""Metric properties + benchmark harness."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lenslesspicam_tpu.eval import metrics as M
from lenslesspicam_tpu.eval.benchmark import benchmark


def test_psnr_mse_basics():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 16, 20, 3).astype(np.float32))
    assert float(M.mse(x, x)) == 0.0
    assert np.all(np.asarray(M.psnr(x, x)) > 100)
    y = jnp.clip(x + 0.1, 0, 1)
    p1 = np.asarray(M.psnr(x, y)).mean()
    z = jnp.clip(x + 0.3, 0, 1)
    p2 = np.asarray(M.psnr(x, z)).mean()
    assert p1 > p2


def test_ssim_properties():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    s_same = np.asarray(M.ssim(x, x))
    assert np.allclose(s_same, 1.0, atol=1e-3)
    noise = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    s_noise = np.asarray(M.ssim(x, noise))
    assert np.all(s_noise < 0.9)
    # symmetry
    a = np.asarray(M.ssim(x, noise))
    b = np.asarray(M.ssim(noise, x))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_ssim_uniform_shift():
    """SSIM of x vs x+c should be < 1 but high for small c."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 32, 32, 1).astype(np.float32) * 0.5)
    y = x + 0.05
    s = float(np.asarray(M.ssim(x, y)).mean())
    assert 0.5 < s < 1.0


def test_max_normalize():
    x = jnp.asarray(np.array([[[[2.0], [4.0]], [[1.0], [0.5]]]]))
    out = np.asarray(M.max_normalize(x))
    assert out.max() == 1.0


def test_benchmark_harness():
    rng = np.random.RandomState(3)
    psf = rng.rand(1, 24, 32, 3).astype(np.float32)
    psf /= np.linalg.norm(psf)

    from lenslesspicam_tpu.recon import admm

    conv = admm.make_convolver(psf)

    def reconstruct(lensless):
        return admm.run_jit(conv, lensless, n_iter=5)

    batches = [
        {
            "lensless": rng.rand(2, 1, 24, 32, 3).astype(np.float32),
            "lensed": rng.rand(2, 1, 24, 32, 3).astype(np.float32),
        }
        for _ in range(2)
    ]
    res = benchmark(reconstruct, batches)
    assert set(res) == {"MSE", "PSNR", "SSIM"}
    assert all(np.isfinite(v) for v in res.values())


def test_ssim_matches_torchmetrics_algorithm():
    """Cross-check SSIM against an independent numpy implementation of
    torchmetrics' algorithm (reflect-pad, 11x11 gaussian sigma 1.5,
    crop the pad border, mean over interior) — the metric the reference
    benchmark reports (lensless/eval/benchmark.py:152)."""

    def np_ssim_torchmetrics(a, b, data_range=1.0, size=11, sigma=1.5,
                             k1=0.01, k2=0.03):
        pad = (size - 1) // 2
        x = np.arange(size) - pad
        g = np.exp(-(x**2) / (2 * sigma**2))
        g = g / g.sum()
        kern = np.outer(g, g)

        def filt(img):
            padded = np.pad(img, ((pad, pad), (pad, pad)), mode="reflect")
            out = np.zeros_like(img)
            for i in range(img.shape[0]):
                for j in range(img.shape[1]):
                    out[i, j] = np.sum(padded[i:i + size, j:j + size] * kern)
            return out

        c1 = (k1 * data_range) ** 2
        c2 = (k2 * data_range) ** 2
        mu_a, mu_b = filt(a), filt(b)
        saa = filt(a * a) - mu_a**2
        sbb = filt(b * b) - mu_b**2
        sab = filt(a * b) - mu_a * mu_b
        num = (2 * mu_a * mu_b + c1) * (2 * sab + c2)
        den = (mu_a**2 + mu_b**2 + c1) * (saa + sbb + c2)
        ssim_map = num / den
        return ssim_map[pad:-pad, pad:-pad].mean()   # torchmetrics crop

    rng = np.random.RandomState(9)
    a = rng.rand(40, 48).astype(np.float32)
    b = np.clip(a + 0.1 * rng.randn(40, 48).astype(np.float32), 0, 1)
    ref = np_ssim_torchmetrics(a.astype(np.float64), b.astype(np.float64))
    ours = float(np.asarray(M.ssim(jnp.asarray(a)[None, :, :, None],
                                   jnp.asarray(b)[None, :, :, None]))[0])
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_benchmark_full_metrics():
    """Reference default metric schema: MSE / PSNR / SSIM /
    ReconstructionError (+ LPIPS with weights), unrolled-output metrics,
    pre-processor aux error (benchmark.py:141-155, 382-445)."""
    from lenslesspicam_tpu.eval.lpips import LPIPS, random_params
    from lenslesspicam_tpu.recon.base import ADMM

    rng = np.random.RandomState(6)
    psf = rng.rand(1, 32, 48, 3).astype(np.float32)
    psf /= np.linalg.norm(psf)
    model = ADMM(psf, n_iter=3)
    lp = LPIPS()
    lp_params = random_params(jax.random.PRNGKey(0), image_shape=(1, 32, 48, 3))
    lpips_fn = jax.jit(lambda p, t: lp.apply(lp_params, p, t))
    lp_alex = LPIPS(net="alex")
    alex_params = random_params(jax.random.PRNGKey(1),
                                image_shape=(1, 32, 48, 3), net="alex")
    lpips_alex_fn = jax.jit(lambda p, t: lp_alex.apply(alex_params, p, t))

    def reconstruct(lensless):
        pred = model.batch_apply(lensless)
        unrolled = pred * 0.9          # stand-ins for intermediates
        preproc = lensless
        return pred, unrolled, preproc, None

    batches = [{
        "lensless": rng.rand(2, 1, 32, 48, 3).astype(np.float32),
        "lensed": rng.rand(2, 1, 32, 48, 3).astype(np.float32),
    }]
    res = benchmark(reconstruct, batches, model=model, lpips_fn=lpips_fn,
                    lpips_alex_fn=lpips_alex_fn,
                    unrolled_output_factor=True, pre_process_aux=True)
    expected = {"MSE", "PSNR", "SSIM", "LPIPS_Vgg", "LPIPS_Alex",
                "ReconstructionError",
                "MSE_unrolled", "PSNR_unrolled", "SSIM_unrolled",
                "LPIPS_Vgg_unrolled", "LPIPS_Alex_unrolled",
                "ReconstructionError_PreProc"}
    assert expected <= set(res)
    assert all(np.isfinite(v) for v in res.values())


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_benchmark_sharded_matches_single_device():
    """Mesh-sharded evaluation == unsharded evaluation."""
    from lenslesspicam_tpu.parallel.sharding import make_mesh
    from lenslesspicam_tpu.recon import admm

    rng = np.random.RandomState(7)
    psf = rng.rand(1, 24, 32, 3).astype(np.float32)
    psf /= np.linalg.norm(psf)
    conv = admm.make_convolver(psf)

    def reconstruct(lensless):
        return admm.run_jit(conv, lensless, n_iter=5)

    batches = [{
        "lensless": rng.rand(8, 1, 24, 32, 3).astype(np.float32),
        "lensed": rng.rand(8, 1, 24, 32, 3).astype(np.float32),
    }]
    base = benchmark(reconstruct, batches)
    mesh = make_mesh(n_data=8)
    sharded = benchmark(reconstruct, batches, mesh=mesh)
    for k in base:
        np.testing.assert_allclose(sharded[k], base[k], rtol=1e-4)


def test_shot_noise():
    from lenslesspicam_tpu.ops.noise import add_shot_noise

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(8, 16, 16, 3).astype(np.float32))
    noisy = add_shot_noise(x, 10.0, jax.random.PRNGKey(0))
    assert noisy.shape == x.shape
    assert float(jnp.min(noisy)) >= 0
    err = float(jnp.mean((noisy - x) ** 2))
    sig = float(jnp.mean(x**2))
    snr_est = 10 * np.log10(sig / err)
    assert 7 < snr_est < 13  # target 10 dB


def test_lpips_plumbing():
    from lenslesspicam_tpu.eval.lpips import LPIPS, random_params

    params = random_params(jax.random.PRNGKey(0))
    model = LPIPS()
    rng = np.random.RandomState(5)
    a = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    d_ab = model.apply(params, a, b)
    d_aa = model.apply(params, a, a)
    assert d_ab.shape == (2,)
    assert np.all(np.asarray(d_aa) < 1e-5)
    assert np.all(np.asarray(d_ab) > np.asarray(d_aa))


def test_parameterize_perturb():
    """P&P test-time adaptation: params move, loss improves."""
    from lenslesspicam_tpu.eval.pnp import parameterize_perturb
    from lenslesspicam_tpu.models.unrolled import UnrolledADMM
    from lenslesspicam_tpu.ops.fft_conv import FFTConvolver

    rng = np.random.RandomState(0)
    psf = rng.rand(1, 24, 32, 3).astype(np.float32)
    psf /= np.linalg.norm(psf)
    model = UnrolledADMM(n_iter=2)
    conv = UnrolledADMM.make_convolver(psf)
    fwd = FFTConvolver.from_psf(psf, pad=True, norm="backward")

    lensed = jnp.asarray(rng.rand(1, 1, 24, 32, 3).astype(np.float32))
    lensless = fwd.convolve(lensed)
    lensless = lensless / jnp.max(lensless)

    params0 = model.init(jax.random.PRNGKey(0), conv, lensless)
    pred, adapted = parameterize_perturb(
        lambda p, d: model.apply(p, conv, d), params0, fwd, lensless,
        mu=1e-4, lr=1e-2, n_iter=10,
    )
    assert pred.shape == lensless.shape
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(adapted),
                        jax.tree_util.tree_leaves(params0))
    )
    assert moved
