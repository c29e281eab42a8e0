"""Split-order matmul FFT: exactness against jnp.fft."""

import numpy as np
import pytest
import jax.numpy as jnp

from lenslesspicam_tpu.ops import pallas_fft as pf


@pytest.mark.parametrize("h,w", [(24, 32), (48, 64), (96, 128)])
def test_split_transforms_match_fft(h, w):
    rng = np.random.RandomState(0)
    x = rng.rand(h, w).astype(np.float32)

    wr, wi = pf.fft_w_split(jnp.asarray(x))
    ref_w = np.fft.fft(x, axis=1)
    idx_w = pf.split_order_indices(w)
    np.testing.assert_allclose(np.asarray(wr), ref_w.real[:, idx_w], atol=1e-3)
    np.testing.assert_allclose(np.asarray(wi), ref_w.imag[:, idx_w], atol=1e-3)

    hr, hi = pf.fft_h_split(wr, wi)
    idx_h = pf.split_order_indices(h)
    ref2 = np.fft.fft2(x)[np.ix_(idx_h, idx_w)]
    np.testing.assert_allclose(np.asarray(hr), ref2.real, atol=1e-2)
    np.testing.assert_allclose(np.asarray(hi), ref2.imag, atol=1e-2)


@pytest.mark.parametrize("h,w", [(24, 32), (96, 128)])
def test_filtered_synthesis_split(h, w):
    rng = np.random.RandomState(1)
    x = rng.rand(h, w).astype(np.float32)
    kern = rng.rand(h, w).astype(np.float32)
    Hf = np.fft.fft2(kern).astype(np.complex64)
    Hs = pf.spectrum_to_split(Hf, axes=(0, 1))
    out = np.asarray(pf.filtered_synthesis_split(
        jnp.asarray(x), jnp.asarray(np.ascontiguousarray(Hs.real)),
        jnp.asarray(np.ascontiguousarray(Hs.imag))))
    ref = np.real(np.fft.ifft2(np.fft.fft2(x) * Hf))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out / scale, ref / scale, atol=2e-5)


def test_roundtrip_identity():
    rng = np.random.RandomState(2)
    x = rng.rand(48, 64).astype(np.float32)
    wr, wi = pf.fft_w_split(jnp.asarray(x))
    hr, hi = pf.fft_h_split(wr, wi)
    br, bi = pf.ifft_h_split(hr, hi)
    back = np.asarray(pf.ifft_w_split(br, bi))
    np.testing.assert_allclose(back, x, atol=1e-4)



def test_admm_split_matches_standard():
    """Split-FFT ADMM == standard ADMM (grayscale single image)."""
    from lenslesspicam_tpu.recon import admm, admm_split
    from lenslesspicam_tpu.recon.admm import ADMMParams

    rng = np.random.RandomState(4)
    psf2d = rng.rand(48, 64).astype(np.float32)
    psf2d /= np.linalg.norm(psf2d)
    data2d = rng.rand(48, 64).astype(np.float32)

    conv = admm.make_convolver(psf2d[None, :, :, None])
    ref = np.asarray(admm.run_jit(conv, data2d[None, None, :, :, None], n_iter=10))[0, 0, :, :, 0]

    pre = admm_split.precompute_split(psf2d, data2d)
    out = np.asarray(admm_split.run_split_jit(pre, ADMMParams(), jnp.asarray(10)))
    scale = max(np.abs(ref).max(), 1e-9)
    # matmul-DFT noise amplified by 1/mu3 -> ~1e-2 state difference with
    # no reconstruction-quality impact (<0.05 dB PSNR, see bench.verify_split)
    np.testing.assert_allclose(out / scale, ref / scale, atol=5e-2)



def test_pallas2_pipeline_interpret():
    """Pass-structured Pallas kernels (interpret) == numpy reference."""
    from lenslesspicam_tpu.ops import pallas_kernels2 as pk2

    pk2._set_interpret(True)
    try:
        rng = np.random.RandomState(6)
        h, w = 96, 256
        x = rng.rand(h, w).astype(np.float32)
        kern = rng.rand(h, w).astype(np.float32)
        Hs = pf.spectrum_to_split(np.fft.fft2(kern).astype(np.complex64), axes=(0, 1))
        fr = jnp.asarray(np.ascontiguousarray(Hs.real))
        fi = jnp.asarray(np.ascontiguousarray(Hs.imag))
        out = np.asarray(pk2.filtered_synthesis_pallas2(jnp.asarray(x), fr, fi,
                                                        block_rows=32))
        ref = np.real(np.fft.ifft2(np.fft.fft2(x) * np.fft.fft2(kern)))
        assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-4

        # unfiltered roundtrip
        wr, wi = pk2.fft_w(jnp.asarray(x), block_rows=32)
        hr, hi = pk2.fft_h(wr, wi, h)
        br, bi = pk2.ifft_h(hr, hi, h)
        back = np.asarray(pk2.ifft_w(br, bi, block_rows=32))
        np.testing.assert_allclose(back, x, atol=1e-4)
    finally:
        pk2._set_interpret(False)


def test_admm_split_fused_matches_jax_backend():
    """Fully-fused Pallas ADMM (e1/e2 state kernels, deferred eta) ==
    the unfused split backend at f32 (interpret mode)."""
    from lenslesspicam_tpu.ops import pallas_kernels2 as pk2
    from lenslesspicam_tpu.recon import admm_split
    from lenslesspicam_tpu.recon.admm import ADMMParams

    pk2._set_interpret(True)
    try:
        rng = np.random.RandomState(11)
        psf2d = rng.rand(48, 64).astype(np.float32)
        psf2d /= np.linalg.norm(psf2d)
        data2d = rng.rand(48, 64).astype(np.float32)
        pre = admm_split.precompute_split(psf2d, data2d)
        ref = np.asarray(admm_split.run_split_jit(pre, ADMMParams(), 10,
                                                  backend="jax"))
        out = np.asarray(admm_split.run_split_jit(pre, ADMMParams(), 10,
                                                  backend="fused"))
        scale = max(np.abs(ref).max(), 1e-9)
        np.testing.assert_allclose(out / scale, ref / scale, atol=1e-5)
    finally:
        pk2._set_interpret(False)


def test_rfft_w_split_matches_numpy():
    """Packed-real half-spectrum W transform (XLA reference) == numpy
    rfft reindexed to the size-M split order; exact roundtrip."""
    rng = np.random.RandomState(7)
    for n in (64, 128, 256):
        m = n // 2
        x = rng.randn(5, n).astype(np.float32)
        xs = pf.to_split_layout(jnp.asarray(x))
        zr, zi = pf.rfft_w_split(xs)
        Z = np.fft.fft(x, axis=1)
        idx = pf.split_order_indices(m)
        gold = Z[:, :m][:, idx]
        gold[:, 0] = Z[:, 0].real + 1j * Z[:, m].real   # packed DC lane
        got = np.asarray(zr) + 1j * np.asarray(zi)
        assert np.abs(got - gold).max() / np.abs(gold).max() < 1e-5
        back = np.asarray(pf.from_split_layout(pf.irfft_w_split(zr, zi)))
        np.testing.assert_allclose(back, x, atol=1e-4)


def test_rfft_w_pallas_kernels_interpret():
    """Packed-real Pallas W kernels (interpret) == the XLA reference."""
    from lenslesspicam_tpu.ops import pallas_kernels2 as pk2

    pk2._set_interpret(True)
    try:
        rng = np.random.RandomState(8)
        x = rng.randn(24, 256).astype(np.float32)
        xs = pf.to_split_layout(jnp.asarray(x))
        zr_ref, zi_ref = pf.rfft_w_split(xs)
        zr, zi = pk2.rfft_w(xs, block_rows=8)
        np.testing.assert_allclose(np.asarray(zr), np.asarray(zr_ref), atol=1e-4)
        np.testing.assert_allclose(np.asarray(zi), np.asarray(zi_ref), atol=1e-4)
        back = np.asarray(pf.from_split_layout(pk2.irfft_w(zr, zi, block_rows=8)))
        np.testing.assert_allclose(back, x, atol=1e-4)
    finally:
        pk2._set_interpret(False)


def test_admm_rfused_matches_exact_solver():
    """Half-spectrum fused ADMM (e1_rfused/e2_rfused + DC patch) ==
    the exact reference-parity solver (interpret mode)."""
    from lenslesspicam_tpu.ops import pallas_kernels2 as pk2
    from lenslesspicam_tpu.recon import admm, admm_split
    from lenslesspicam_tpu.recon.admm import ADMMParams

    pk2._set_interpret(True)
    try:
        rng = np.random.RandomState(12)
        psf2d = rng.rand(48, 64).astype(np.float32)
        psf2d /= np.linalg.norm(psf2d)
        data2d = rng.rand(48, 64).astype(np.float32)
        conv = admm.make_convolver(psf2d[None, :, :, None])
        ref = np.asarray(admm.run_jit(conv, data2d[None, None, :, :, None],
                                      n_iter=10))[0, 0, :, :, 0]
        pre = admm_split.precompute_rsplit(psf2d, data2d)
        out = np.asarray(admm_split.run_rsplit_jit(pre, ADMMParams(), 10))
        scale = max(np.abs(ref).max(), 1e-9)
        np.testing.assert_allclose(out / scale, ref / scale, atol=1e-5)
    finally:
        pk2._set_interpret(False)


def test_admm_rfused_v3_matches_v2_placement(monkeypatch):
    """The v3 kernel placement (X/v chain inside the dual W-inverse,
    stripe halos — pallas_kernels2.irfft_w_dual_state/e1_rtv) computes
    the IDENTICAL recurrence as the v2 placement (e1_rcarry +
    irfft_w_dual): same images at every iteration count."""
    from lenslesspicam_tpu.ops import pallas_kernels2 as pk2
    from lenslesspicam_tpu.recon import admm_split
    from lenslesspicam_tpu.recon.admm import ADMMParams

    pk2._set_interpret(True)
    try:
        rng = np.random.RandomState(7)
        psf2d = rng.rand(40, 56).astype(np.float32)
        psf2d /= np.linalg.norm(psf2d)
        data2d = rng.rand(40, 56).astype(np.float32)
        pre = admm_split.precompute_rsplit(psf2d, data2d)
        outs = {}
        for flag in ("1", "0"):
            monkeypatch.setenv("LPT_RFUSED_V3", flag)
            # bypass the jit cache: the env flag is read at trace time
            outs[flag] = np.asarray(
                admm_split.run_split_rfused(pre, ADMMParams(), 7))
        np.testing.assert_allclose(outs["1"], outs["0"], atol=2e-6)
    finally:
        pk2._set_interpret(False)


def test_admm_rfused_carry_saturation_channel(monkeypatch):
    """int16 carry safety (VERDICT r3 #3): the sat channel reports the
    max pre-quantization |carry| / full-scale.  On a max-normalized
    scene it stays well below 1 and the solver matches the exact one;
    on out-of-contract data (100x the assumed range) it flags >= 1 —
    the silent-clip scenario is now DETECTED."""
    import jax
    from lenslesspicam_tpu.ops import pallas_kernels2 as pk2
    from lenslesspicam_tpu.recon import admm, admm_split
    from lenslesspicam_tpu.recon.admm import ADMMParams

    pk2._set_interpret(True)
    monkeypatch.setattr(pk2, "_CARRY_V_DTYPE", jnp.int16)
    monkeypatch.setattr(pk2, "_CARRY_TV_DTYPE", jnp.int16)
    try:
        rng = np.random.RandomState(11)
        psf2d = rng.rand(40, 56).astype(np.float32)
        psf2d /= np.linalg.norm(psf2d)
        data2d = rng.rand(40, 56).astype(np.float32)
        data2d /= data2d.max()      # the assumed max-normalized contract

        pre = admm_split.precompute_rsplit(psf2d, data2d)
        out, sat = admm_split.run_split_rfused(pre, ADMMParams(), 20,
                                               return_sat=True)
        sat = float(sat)
        assert 0.0 < sat < 1.0, f"in-contract scene saturates: {sat}"

        conv = admm.make_convolver(psf2d[None, :, :, None])
        ref = np.asarray(admm.run_jit(
            conv, jnp.asarray(data2d[None, None, :, :, None]),
            n_iter=20))[0, 0, :, :, 0]
        scale = max(np.abs(ref).max(), 1e-9)
        assert np.abs(np.asarray(out) - ref).max() / scale < 0.05

        # out-of-contract: 100x data blows past the mu1-derived v scale
        pre_hot = admm_split.precompute_rsplit(psf2d, 100.0 * data2d)
        _, sat_hot = admm_split.run_split_rfused(pre_hot, ADMMParams(), 20,
                                                 return_sat=True)
        assert float(sat_hot) >= 1.0, (
            f"clipping not detected: {float(sat_hot)}")

        # v2 placement carries the (post-clip) detection too
        monkeypatch.setenv("LPT_RFUSED_V3", "0")
        _, sat_v2 = admm_split.run_split_rfused(pre_hot, ADMMParams(), 20,
                                                return_sat=True)
        assert float(sat_v2) >= 0.999
    finally:
        pk2._set_interpret(False)


def test_admm_split_general_batched_rgb_3d():
    """Batched RGB multi-depth split solver == standard solver."""
    import jax
    from lenslesspicam_tpu.recon import admm, admm_split

    rng = np.random.RandomState(5)
    psf = rng.rand(2, 32, 48, 3).astype(np.float32)
    psf /= np.linalg.norm(psf)
    data = rng.rand(2, 1, 32, 48, 3).astype(np.float32)

    conv = admm.make_convolver(psf)
    ref = np.asarray(admm.run_jit(conv, data, n_iter=5))
    pre, info = admm_split.precompute_split_general(psf, data)
    out = np.asarray(jax.jit(
        lambda d: admm_split.run_split_general(pre, info, d, n_iter=5)
    )(jnp.asarray(data)))
    assert out.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-9)
    np.testing.assert_allclose(out / scale, ref / scale, atol=5e-2)


def test_admm_rfused_general_batched_rgb():
    """Batched RGB multi-plane rfused solver (nested-vmap Pallas) ==
    standard solver (interpret mode)."""
    from lenslesspicam_tpu.ops import pallas_kernels2 as pk2
    from lenslesspicam_tpu.recon import admm, admm_split
    from lenslesspicam_tpu.recon.admm import ADMMParams

    pk2._set_interpret(True)
    try:
        rng = np.random.RandomState(2)
        psf = rng.rand(1, 48, 64, 3).astype(np.float32)
        psf /= np.linalg.norm(psf)
        data = rng.rand(2, 1, 48, 64, 3).astype(np.float32)
        conv = admm.make_convolver(psf)
        ref = np.asarray(admm.run_jit(conv, data, n_iter=10))
        pre, info = admm_split.precompute_rsplit_general(psf, data)
        out = np.asarray(admm_split.run_rsplit_general(
            pre, info, data, ADMMParams(), 10))
        scale = max(np.abs(ref).max(), 1e-9)
        np.testing.assert_allclose(out / scale, ref / scale, atol=1e-5)
    finally:
        pk2._set_interpret(False)




def test_rfused_int16_tv_carries():
    """int16 fixed-point TV carries (KKT-bounded a0/a1/b) reconstruct a
    structured scene within 0.2 dB of the exact solver at the benchmark
    protocol's deep end (monkeypatched dtype; bench.py enables it via
    LPT_CARRY_TV=i16 behind its own quality gates)."""
    import jax.numpy as jnp

    from lenslesspicam_tpu.ops import pallas_kernels2 as pk2
    from lenslesspicam_tpu.ops.fft_conv import FFTConvolver
    from lenslesspicam_tpu.recon import admm, admm_split
    from lenslesspicam_tpu.recon.admm import ADMMParams

    h, w = 96, 128
    rng = np.random.RandomState(1)
    scene = np.zeros((h, w), np.float32)
    scene[20:40, 30:60] = 1.0
    scene[50:80, 70:110] = 0.6
    psf = np.zeros((h, w), np.float32)
    ys, xs = rng.randint(0, h, 200), rng.randint(0, w, 200)
    psf[ys, xs] = rng.rand(200)
    psf /= np.linalg.norm(psf)
    fwd = FFTConvolver.from_psf(psf[None, :, :, None], pad=True,
                                norm="backward")
    meas = np.asarray(fwd.convolve(jnp.asarray(
        scene[None, None, :, :, None]))).squeeze()
    meas = (meas / meas.max()).astype(np.float32)

    conv = admm.make_convolver(psf[None, :, :, None])
    ref = np.asarray(admm.run_jit(conv, jnp.asarray(
        meas[None, None, :, :, None]), n_iter=300))[0, 0, :, :, 0]

    old = pk2._CARRY_TV_DTYPE
    pk2._CARRY_TV_DTYPE = jnp.int16
    # the carry dtype is read at trace time from the module global: drop
    # any cached trace of the same arg signature or the patch is a no-op
    admm_split._run_rsplit_jit.clear_cache()
    try:
        pre = admm_split.precompute_rsplit(psf, meas)
        out = np.asarray(admm_split.run_rsplit_jit(pre, ADMMParams(),
                                                   jnp.asarray(300)))
    finally:
        pk2._CARRY_TV_DTYPE = old
        admm_split._run_rsplit_jit.clear_cache()

    def psnr_of(x):
        xn = x / max(x.max(), 1e-9)
        sn = scene / scene.max()
        return -10 * np.log10(np.mean((xn - sn) ** 2) + 1e-12)

    assert abs(psnr_of(ref) - psnr_of(out)) < 0.2


def test_rfused_int16_v_carry():
    """int16 fixed-point v carry (mu1-scaled data-fidelity dual, full
    scale 64*mu1) reconstructs a structured scene within 0.2 dB of the
    exact solver at n_iter=300 (monkeypatched dtype; bench.py enables
    it via LPT_CARRY_V=i16 behind its own quality gates).  Validated
    offline in scripts/dev/_probe_vquant.py: max|v| ~ 14*mu1 at 300
    iterations, quantization cost <= 0.04 dB."""
    import jax.numpy as jnp

    from lenslesspicam_tpu.ops import pallas_kernels2 as pk2
    from lenslesspicam_tpu.ops.fft_conv import FFTConvolver
    from lenslesspicam_tpu.recon import admm, admm_split
    from lenslesspicam_tpu.recon.admm import ADMMParams

    h, w = 96, 128
    rng = np.random.RandomState(2)
    scene = np.zeros((h, w), np.float32)
    scene[25:45, 20:70] = 0.9
    scene[55:75, 60:120] = 0.4
    psf = np.zeros((h, w), np.float32)
    ys, xs = rng.randint(0, h, 200), rng.randint(0, w, 200)
    psf[ys, xs] = rng.rand(200)
    psf /= np.linalg.norm(psf)
    fwd = FFTConvolver.from_psf(psf[None, :, :, None], pad=True,
                                norm="backward")
    meas = np.asarray(fwd.convolve(jnp.asarray(
        scene[None, None, :, :, None]))).squeeze()
    meas = (meas / meas.max()).astype(np.float32)

    conv = admm.make_convolver(psf[None, :, :, None])
    ref = np.asarray(admm.run_jit(conv, jnp.asarray(
        meas[None, None, :, :, None]), n_iter=300))[0, 0, :, :, 0]

    old = pk2._CARRY_V_DTYPE
    pk2._CARRY_V_DTYPE = jnp.int16
    admm_split._run_rsplit_jit.clear_cache()  # see TV-carry test
    try:
        pre = admm_split.precompute_rsplit(psf, meas)
        out = np.asarray(admm_split.run_rsplit_jit(pre, ADMMParams(),
                                                   jnp.asarray(300)))
    finally:
        pk2._CARRY_V_DTYPE = old
        admm_split._run_rsplit_jit.clear_cache()

    def psnr_of(x):
        xn = x / max(x.max(), 1e-9)
        sn = scene / scene.max()
        return -10 * np.log10(np.mean((xn - sn) ** 2) + 1e-12)

    assert abs(psnr_of(ref) - psnr_of(out)) < 0.2
