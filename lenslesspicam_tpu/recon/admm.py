"""ADMM with TV prior and non-negativity — jit-compiled fixed-point loop.

Functional re-design of the reference ADMM (lensless/recon/admm.py:24-419):
the seven state tensors live in an ``ADMMState`` pytree, one iteration is a
pure ``state -> state`` function, and the solver is a ``lax.fori_loop`` with
a *dynamic* iteration count — the benchmark sweep over n_iter compiles once.

Numerics match the reference exactly:

* unpadded operation (``pad=False``, ``norm="backward"`` — admm.py:46-47,
  100-101): all state lives on the padded grid;
* frequency-domain inverses ``R_divmat = 1/(mu1 |H|^2 + mu2 |PsiTPsi| +
  mu3)`` and ``X_divmat = 1/(pad(1) + mu1)`` precomputed once
  (admm.py:186-230), stored *real* (the reference casts to complex, a
  wasted 2x in memory/bandwidth — a real multiply is mathematically
  identical);
* update order U -> X -> W -> image -> forward/Psi -> xi -> eta -> rho
  (admm.py:313-329);
* final image = crop + clip>=0 (admm.py:331-338).

Differences (intentional, TPU-first):

* the measurement is padded once before the loop instead of every
  iteration (admm.py:253 re-pads per iteration; identical numerics);
* 3-D (multi-depth) PSFs are supported: depths reconstruct independently,
  matching the broadcast semantics the reference applies in gradient
  descent (reference ADMM raises NotImplementedError, admm.py:92-96);
* batched data is first-class: all ops broadcast over a leading batch dim.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
from functools import partial
import jax.numpy as jnp

from ..ops.fft_conv import FFTConvolver, filtered_synthesis
from ..ops.tv import finite_diff, finite_diff_adj, finite_diff_gram_spectrum, soft_thresh


class ADMMParams(NamedTuple):
    """Hyper-parameters (admm.py:39-42 defaults)."""

    mu1: jax.Array | float = 1e-6
    mu2: jax.Array | float = 1e-5
    mu3: jax.Array | float = 4e-5
    tau: jax.Array | float = 1e-4


class ADMMPrecomp(NamedTuple):
    """Loop-invariant tensors."""

    R_divmat: jax.Array  # real (D, Ph, Pw/2+1, C)
    X_divmat: jax.Array  # real (D, Ph, Pw, C)
    data_pad: jax.Array  # measurement on padded grid (B, D, Ph, Pw, C)


class ADMMState(NamedTuple):
    """Carry-rebuild ADMM state: the accumulating duals are never
    carried — each is rebuilt in :func:`step` from one identity
    (xi = mu1*fwd - v with v = mu1*X - xi; rho = mu3*image - b with
    b = mu3*W - rho; eta = mu2*psi - a with a = mu2*U - eta), which
    halves the live loop-carry memory at identical algebra."""

    image_est: jax.Array
    forward_out: jax.Array
    v: jax.Array          # mu1*X - xi of the previous iteration
    b: jax.Array          # mu3*W - rho of the previous iteration
    a: jax.Array          # mu2*U - eta of the previous iteration (2ch)


def make_convolver(psf, dtype=jnp.float32, pad_policy: str = "ref") -> FFTConvolver:
    """ADMM's convolver: unpadded, backward norm (admm.py:100-101)."""
    return FFTConvolver.from_psf(psf, pad=False, norm="backward", dtype=dtype, pad_policy=pad_policy)


def precompute(conv: FFTConvolver, data, params: ADMMParams) -> ADMMPrecomp:
    """Loop-invariant operators (admm.py:186-230) + hoisted data padding."""
    dtype = conv.H.real.dtype
    psi_tpsi = finite_diff_gram_spectrum(conv.padded_shape, dtype)
    R_divmat = 1.0 / (params.mu1 * conv.mag_sq() + params.mu2 * psi_tpsi + params.mu3)
    ones = jnp.ones(conv.psf_shape, dtype)
    X_divmat = 1.0 / (conv.pad_input(ones) + params.mu1)
    data = jnp.asarray(data, dtype)
    if data.ndim == 3:
        data = data[None, None]
    elif data.ndim == 4:
        data = data[None]
    data_pad = conv.pad_input(data)
    return ADMMPrecomp(R_divmat.astype(dtype), X_divmat.astype(dtype), data_pad)


def init_state(conv: FFTConvolver, batch_size: int = 1, initial_est=None,
               params: ADMMParams = ADMMParams()) -> ADMMState:
    """Zero-dual state on the padded grid (admm.py:150-218).  The carry
    initializers encode zero duals: with xi = eta = rho = 0 the rebuild
    identities give v = mu1*fwd(img0), b = mu3*img0, a = mu2*psi(img0)
    (all zero for a zero initial estimate) — ready for :func:`step`."""
    dtype = conv.H.real.dtype
    shape = (batch_size,) + conv.padded_shape
    if initial_est is not None:
        image = jnp.broadcast_to(jnp.asarray(initial_est, dtype), shape)
        forward_out = conv.convolve(image)
        psi0 = finite_diff(image)
    else:
        image = jnp.zeros(shape, dtype)
        forward_out = jnp.zeros(shape, dtype)
        psi0 = jnp.zeros(shape + (2,), dtype)
    return ADMMState(
        image_est=image,
        forward_out=forward_out,
        v=params.mu1 * forward_out,
        b=params.mu3 * image,
        a=params.mu2 * psi0,
    )


def step(state: ADMMState, conv: FFTConvolver, pre: ADMMPrecomp, params: ADMMParams) -> ADMMState:
    """One ADMM iteration (admm.py:313-329).

    FFT economy — 4 padded-grid FFTs per iteration vs the reference's 6
    (SURVEY §3.1), numerically identical by linearity:

    * the deconvolve term of ``rk`` is added in the frequency domain:
      ``F(rk) = F(spatial terms) + conj(H) * F(mu1 X - xi)`` — removes
      the irfft2+rfft2 round trip between deconvolve and image update;
    * the forward convolve reuses the image's spectrum: ``rfft2(irfft2(
      F_image)) == F_image`` for a valid half-spectrum.
    """
    mu1, mu2, mu3, tau = params.mu1, params.mu2, params.mu3, params.tau
    ph, pw = conv.padded_spatial_shape

    # rebuild the duals from the carries (one identity each)
    psi = finite_diff(state.image_est)
    eta_eff = mu2 * psi - state.a
    xi = mu1 * state.forward_out - state.v
    rho = mu3 * state.image_est - state.b

    # U update: TV prox (admm.py:232-247)
    U = soft_thresh(psi + eta_eff / mu2, tau / mu2)
    a = mu2 * U - eta_eff
    # X update (admm.py:249-254)
    X = pre.X_divmat * (xi + mu1 * state.forward_out + pre.data_pad)
    v = mu1 * X - xi
    # W update: non-negativity (admm.py:256-263)
    W = jnp.maximum(rho / mu3 + state.image_est, 0.0)
    b = mu3 * W - rho
    # image update (admm.py:265-294), deconvolve folded into the spectrum
    rk_spatial = b + finite_diff_adj(a)
    F_rk = (
        jnp.fft.rfft2(rk_spatial, axes=(-3, -2))
        + jnp.conj(conv.H) * jnp.fft.rfft2(v, axes=(-3, -2))
    )
    F_image = pre.R_divmat * F_rk
    image_est = jnp.fft.irfft2(F_image, s=(ph, pw), axes=(-3, -2))
    forward_out = jnp.fft.irfft2(F_image * conv.H, s=(ph, pw), axes=(-3, -2))

    return ADMMState(image_est, forward_out, v, b, a)


def form_image(state: ADMMState, conv: FFTConvolver) -> jax.Array:
    """Crop to sensor grid and clip negatives (admm.py:331-338)."""
    return jnp.maximum(conv.crop(state.image_est), 0.0)


def run(
    conv: FFTConvolver,
    data,
    params: ADMMParams = ADMMParams(),
    n_iter: int = 100,
    initial_est=None,
) -> jax.Array:
    """Full reconstruction: returns ``(batch, depth, H, W, C)``.

    ``n_iter`` may be a traced value — the loop is a ``lax.fori_loop`` so
    iteration sweeps reuse one executable.
    """
    pre = precompute(conv, data, params)
    batch = pre.data_pad.shape[0]
    state = init_state(conv, batch, initial_est, params)

    def body(_, s):
        return step(s, conv, pre, params)

    state = jax.lax.fori_loop(0, n_iter, body, state)
    return form_image(state, conv)


def run_state(conv: FFTConvolver, data, params: ADMMParams = ADMMParams(),
              n_iter=100, state: ADMMState | None = None):
    """Chunk-resumable solve: run ``n_iter`` steps from ``state`` (or a
    fresh zero-dual state) and return ``(image, state)`` — the exact-
    continuation backbone of ``apply(disp_iter=...)`` progress display
    (reference recon.py apply's disp_iter loop)."""
    pre = precompute(conv, data, params)
    if state is None:
        state = init_state(conv, pre.data_pad.shape[0], None, params)

    def body(_, s):
        return step(s, conv, pre, params)

    state = jax.lax.fori_loop(0, n_iter, body, state)
    return form_image(state, conv), state


@partial(jax.jit, static_argnames=("params",))
def run_state_jit(conv, data, params, n_iter, state):
    return run_state(conv, data, params, n_iter, state)


def run_pnp(
    conv: FFTConvolver,
    data,
    denoiser,
    params: ADMMParams = ADMMParams(),
    n_iter: int = 100,
    noise_level: float = 10.0,
    use_dual: bool = False,
    initial_est=None,
) -> jax.Array:
    """Plug-and-play ADMM: the TV prox is replaced by a denoiser
    (admm.py:232-247,265-275,302-308).

    ``denoiser(image, noise_level) -> image`` operates on the padded
    grid (B, D, Ph, Pw, C).  With ``use_dual`` the denoiser consumes
    ``U + eta/mu2`` and the eta dual is tracked; otherwise it denoises
    the current image estimate directly and eta stays zero.
    """
    mu1, mu2, mu3 = params.mu1, params.mu2, params.mu3
    pre = precompute(conv, data, params)
    batch = pre.data_pad.shape[0]
    dtype = conv.H.real.dtype
    shape = (batch,) + conv.padded_shape
    ph, pw = conv.padded_spatial_shape

    # in PnP, U/eta are image-shaped (PsiT = identity, admm.py:133)
    if initial_est is not None:
        image = jnp.broadcast_to(jnp.asarray(initial_est, dtype), shape)
    else:
        image = jnp.zeros(shape, dtype)
    zeros = jnp.zeros(shape, dtype)
    state = dict(image=image, U=zeros, xi=zeros, eta=zeros, rho=zeros,
                 forward_out=conv.convolve(image) if initial_est is not None else zeros)

    def body(_, s):
        if use_dual:
            U = denoiser(s["U"] + s["eta"] / mu2, noise_level)
        else:
            U = denoiser(s["image"], noise_level)
        X = pre.X_divmat * (s["xi"] + mu1 * s["forward_out"] + pre.data_pad)
        W = jnp.maximum(s["rho"] / mu3 + s["image"], 0.0)
        if use_dual:
            rk = (mu3 * W - s["rho"]) + (mu2 * U - s["eta"]) \
                + conv.deconvolve(mu1 * X - s["xi"])
        else:
            rk = (mu3 * W - s["rho"]) + mu2 * U \
                + conv.deconvolve(mu1 * X - s["xi"])
        image = filtered_synthesis(rk, pre.R_divmat, (ph, pw))
        forward_out = conv.convolve(image)
        eta = s["eta"] + mu2 * (image - U) if use_dual else s["eta"]
        return dict(image=image, U=U,
                    xi=s["xi"] + mu1 * (forward_out - X),
                    eta=eta,
                    rho=s["rho"] + mu3 * (image - W),
                    forward_out=forward_out)

    state = jax.lax.fori_loop(0, n_iter, body, state)
    return jnp.maximum(conv.crop(state["image"]), 0.0)


def run_jit(conv, data, params=ADMMParams(), n_iter=100, initial_est=None):
    """jit-compiled entry; n_iter stays dynamic (no recompiles across sweeps)."""
    return _run_jit(conv, data, params, jnp.asarray(n_iter), initial_est)


@jax.jit
def _run_jit(conv, data, params, n_iter, initial_est):
    return run(conv, data, params, n_iter, initial_est)
