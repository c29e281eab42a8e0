"""FFTConvolver: algebraic invariants + golden parity vs the reference.

Mirrors and extends the reference test strategy (test/test_convolver.py):
pad/crop round trip, channel independence; adds adjointness (implied but
untested in the reference) and bit-level golden parity against the
reference numpy RealFFTConvolve2D on synthetic data.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from conftest import reference_available, add_reference_to_path
from lenslesspicam_tpu.ops.fft_conv import FFTConvolver


def _rand_psf(shape, seed=0):
    rng = np.random.RandomState(seed)
    psf = rng.rand(*shape).astype(np.float32)
    return psf / np.linalg.norm(psf)


@pytest.mark.parametrize("shape", [(1, 32, 40, 3), (5, 47, 29, 3), (1, 33, 27, 1)])
def test_pad_crop_roundtrip(shape):
    conv = FFTConvolver.from_psf(_rand_psf(shape))
    x = jnp.asarray(np.random.RandomState(1).rand(*shape).astype(np.float32))
    assert np.allclose(conv.crop(conv.pad_input(x)), x)


@pytest.mark.parametrize("shape", [(1, 32, 40, 3), (5, 47, 29, 3)])
@pytest.mark.parametrize("pad", [True, False])
def test_adjointness(shape, pad):
    """<Hx, y> == <x, H^T y> on the (padded) grid."""
    conv = FFTConvolver.from_psf(_rand_psf(shape), pad=pad, norm="backward")
    rng = np.random.RandomState(2)
    work_shape = shape if pad else conv.padded_shape
    x = jnp.asarray(rng.rand(*work_shape).astype(np.float32))
    y = jnp.asarray(rng.rand(*work_shape).astype(np.float32))
    if pad:
        # on the padded grid the operator (incl. crop/pad) is exactly adjoint
        lhs = jnp.vdot(conv.convolve(conv.pad_input(x) if False else x), y)
        # crop ∘ conv ∘ pad vs pad^T ∘ conv^T ∘ crop^T: pad^T = crop
        rhs = jnp.vdot(x, conv.deconvolve(y))
    else:
        lhs = jnp.vdot(conv.convolve(x), y)
        rhs = jnp.vdot(x, conv.deconvolve(y))
    assert np.allclose(lhs, rhs, rtol=1e-3), (lhs, rhs)


def test_channel_independence():
    """Convolving RGB at once == convolving each channel separately."""
    psf = _rand_psf((1, 32, 40, 3))
    conv = FFTConvolver.from_psf(psf)
    x = np.random.RandomState(3).rand(1, 32, 40, 3).astype(np.float32)
    full = np.asarray(conv.convolve(jnp.asarray(x)))
    for c in range(3):
        conv_c = FFTConvolver.from_psf(psf[..., c : c + 1])
        single = np.asarray(conv_c.convolve(jnp.asarray(x[..., c : c + 1])))
        assert np.allclose(full[..., c : c + 1], single, atol=1e-5)


def test_batch_dim():
    psf = _rand_psf((1, 32, 40, 3))
    conv = FFTConvolver.from_psf(psf)
    xb = np.random.RandomState(4).rand(4, 1, 32, 40, 3).astype(np.float32)
    batched = np.asarray(conv.convolve(jnp.asarray(xb)))
    for b in range(4):
        single = np.asarray(conv.convolve(jnp.asarray(xb[b])))
        assert np.allclose(batched[b], single, atol=1e-5)


def test_delta_psf_identity():
    """A centered delta PSF should act (nearly) as identity."""
    shape = (1, 32, 40, 1)
    psf = np.zeros(shape, np.float32)
    psf[0, 16, 20, 0] = 1.0
    conv = FFTConvolver.from_psf(psf, norm="backward")
    x = np.random.RandomState(5).rand(*shape).astype(np.float32)
    out = np.asarray(conv.convolve(jnp.asarray(x)))
    assert np.allclose(out, x, atol=1e-4)


@pytest.mark.parametrize("pad_policy", ["even", "tpu"])
def test_padding_policy_equivalence(pad_policy):
    """Larger/aligned padded grids give the same linear-convolution values."""
    psf = _rand_psf((1, 47, 29, 3))
    ref = FFTConvolver.from_psf(psf, pad_policy="ref")
    alt = FFTConvolver.from_psf(psf, pad_policy=pad_policy)
    x = np.random.RandomState(6).rand(1, 47, 29, 3).astype(np.float32)
    a = np.asarray(ref.convolve(jnp.asarray(x)))
    b = np.asarray(alt.convolve(jnp.asarray(x)))
    assert np.allclose(a, b, atol=1e-4)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("shape", [(1, 32, 40, 3), (5, 47, 29, 3), (1, 33, 27, 1)])
@pytest.mark.parametrize("pad,norm", [(True, "ortho"), (False, "backward")])
def test_golden_vs_reference(shape, pad, norm):
    add_reference_to_path()
    from lensless.recon.rfft_convolve import RealFFTConvolve2D

    psf = _rand_psf(shape)
    rng = np.random.RandomState(7)
    ref_conv = RealFFTConvolve2D(psf.copy(), pad=pad, norm=norm)
    ours = FFTConvolver.from_psf(psf, pad=pad, norm=norm)
    assert list(ref_conv._padded_shape) == list(ours.padded_shape)

    x_shape = shape if pad else tuple(ref_conv._padded_shape)
    x = rng.rand(*x_shape).astype(np.float32)
    ref_out = ref_conv.convolve(x.copy())
    our_out = np.asarray(ours.convolve(jnp.asarray(x)))
    np.testing.assert_allclose(our_out, ref_out, atol=2e-5)

    ref_adj = ref_conv.deconvolve(x.copy())
    our_adj = np.asarray(ours.deconvolve(jnp.asarray(x)))
    np.testing.assert_allclose(our_adj, ref_adj, atol=2e-5)


def test_custom_vjp_matches_autodiff():
    """filtered_synthesis custom VJP == autodiff of the raw FFT chain."""
    import jax
    from lenslesspicam_tpu.ops.fft_conv import filtered_synthesis

    rng = np.random.RandomState(11)
    for ph, pw in [(8, 10), (7, 9)]:
        x = jnp.asarray(rng.rand(2, 1, ph, pw, 3).astype(np.float32))
        H = jnp.asarray(
            np.fft.rfft2(rng.rand(1, ph, pw, 3), axes=(-3, -2)).astype(np.complex64)
        )
        g = jnp.asarray(rng.rand(2, 1, ph, pw, 3).astype(np.float32))

        def raw(x, H):
            return jnp.fft.irfft2(
                jnp.fft.rfft2(x, axes=(-3, -2)) * H, s=(ph, pw), axes=(-3, -2)
            )

        def L_raw(x, H):
            return jnp.sum(raw(x, H) * g)

        def L_cv(x, H):
            return jnp.sum(filtered_synthesis(x, H, (ph, pw)) * g)

        dx_r, dH_r = jax.grad(L_raw, argnums=(0, 1))(x, H)
        dx_c, dH_c = jax.grad(L_cv, argnums=(0, 1))(x, H)
        np.testing.assert_allclose(np.asarray(dx_c), np.asarray(dx_r), atol=1e-4)
        np.testing.assert_allclose(np.asarray(dH_c), np.asarray(dH_r), atol=1e-4)
