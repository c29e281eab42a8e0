"""Unrolled ADMM / FISTA with learnable per-iteration hyper-parameters.

Re-design of lensless/recon/unrolled_admm.py:20-240 and
unrolled_fista.py:19-106 as flax.linen modules whose iteration loop is a
``jax.lax.scan`` over per-iteration parameter slices — gradients flow
through the scan (optionally rematerialized), instead of torch's fully
unrolled autograd graph.

Parity notes:

* learnable vectors mu1/mu2/mu3/tau of length n_iter, made positive with
  ``abs`` at use (unrolled_admm.py:83-94,141-144);
* the reference precomputes R_divmat/X_divmat with a leading iteration
  axis (unrolled_admm.py:168-179) — an n_iter x full-grid complex tensor.
  We compute them inside each scan step from the cached real spectra:
  identical numerics, O(n_iter) less memory, and the elementwise divide
  fuses into the step;
* FISTA: learnable per-iteration per-channel step sizes initialized at
  1.8/max|H|^2 and a learnable t_k sequence (unrolled_fista.py:61-80),
  half-intensity init (unrolled_fista.py:55-59).
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fft_conv import FFTConvolver, filtered_synthesis
from ..ops.tv import finite_diff, finite_diff_adj, finite_diff_gram_spectrum, soft_thresh


def _promote_batch(data):
    if data.ndim == 3:
        return data[None, None]
    if data.ndim == 4:
        return data[None]
    return data


class UnrolledADMM(nn.Module):
    """Le-ADMM: unrolled ADMM with learnable hyper-parameter schedules.

    ``__call__(conv, data)`` takes the (unpadded, backward-norm) convolver
    and a measurement ``(B, D, H, W, C)``; returns the cropped, clipped
    reconstruction of the same shape.
    """

    n_iter: int = 5
    mu1: float = 1e-6
    mu2: float = 1e-5
    mu3: float = 4e-5
    tau: float = 1e-4
    learn_params: bool = True
    remat: bool = False

    @staticmethod
    def make_convolver(psf, dtype=jnp.float32, pad_policy="ref"):
        return FFTConvolver.from_psf(psf, pad=False, norm="backward", dtype=dtype,
                                     pad_policy=pad_policy)

    def _schedules(self):
        def vec(name, value):
            if self.learn_params:
                p = self.param(name, lambda _: jnp.full((self.n_iter,), value, jnp.float32))
            else:
                p = jnp.full((self.n_iter,), value, jnp.float32)
            return jnp.abs(p)

        return vec("mu1", self.mu1), vec("mu2", self.mu2), vec("mu3", self.mu3), vec("tau", self.tau)

    @nn.compact
    def __call__(self, conv: FFTConvolver, data: jax.Array, psf=None,
                 return_intermediates: bool = False):
        mu1s, mu2s, mu3s, taus = self._schedules()
        data = _promote_batch(data)
        dtype = data.dtype
        batch = data.shape[0]
        ph, pw = conv.padded_spatial_shape

        mag_sq = conv.mag_sq()
        psi_tpsi = finite_diff_gram_spectrum(conv.padded_shape, dtype)
        ones_pad = conv.pad_input(jnp.ones(conv.psf_shape, dtype))
        data_pad = conv.pad_input(data)

        shape = (batch,) + conv.padded_shape
        zeros = jnp.zeros(shape, dtype)
        # carry-rebuild state (recon/admm.py ADMMState): the duals are
        # rebuilt per step from {v, b, a}; with PER-ITERATION learnable
        # mus the identities use the PREVIOUS step's mus, carried as
        # three scalars — shrinks the scan carry (and its remat/backward
        # footprint) from 12 to 7 plane-equivalents.
        state = dict(
            image=zeros, forward_out=zeros, v=zeros, b=zeros,
            a=jnp.zeros(shape + (2,), dtype),
            mu_prev=jnp.ones((3,), dtype),  # any value: carries are zero
        )

        def step(s, mus):
            mu1, mu2, mu3, tau = mus
            p1, p2, p3 = s["mu_prev"]
            R_divmat = 1.0 / (mu1 * mag_sq + mu2 * psi_tpsi + mu3)
            X_divmat = 1.0 / (ones_pad + mu1)
            psi = finite_diff(s["image"])
            eta = p2 * psi - s["a"]
            xi = p1 * s["forward_out"] - s["v"]
            rho = p3 * s["image"] - s["b"]
            U = soft_thresh(psi + eta / mu2, tau / mu2)
            a = mu2 * U - eta
            X = X_divmat * (xi + mu1 * s["forward_out"] + data_pad)
            v = mu1 * X - xi
            W = jnp.maximum(rho / mu3 + s["image"], 0.0)
            b = mu3 * W - rho
            rk = b + finite_diff_adj(a) + conv.deconvolve(v)
            image = filtered_synthesis(rk, R_divmat, (ph, pw))
            forward_out = conv.convolve(image)
            s_new = dict(
                image=image, forward_out=forward_out, v=v, b=b, a=a,
                mu_prev=jnp.stack([mu1, mu2, mu3]),
            )
            out = jnp.clip(conv.crop(image), 0.0, None) if return_intermediates else None
            return s_new, out

        step_fn = jax.checkpoint(step) if self.remat else step
        state, inters = jax.lax.scan(step_fn, state, (mu1s, mu2s, mu3s, taus))
        final = jnp.clip(conv.crop(state["image"]), 0.0, None)
        if return_intermediates:
            # per-iteration cropped estimates, excluding the last
            # (recon.py:575-578 collects i < n_iter - 1)
            return final, [inters[i] for i in range(self.n_iter - 1)]
        return final


class UnrolledFISTA(nn.Module):
    """Unrolled FISTA with learnable step sizes and t_k sequence
    (unrolled_fista.py:19-106)."""

    n_iter: int = 5
    tk: float = 1.0
    learn_tk: bool = True
    learn_params: bool = True
    lip_fact: float = 1.8
    proj: Callable = staticmethod(lambda x: jnp.maximum(x, 0.0))
    remat: bool = False

    @staticmethod
    def make_convolver(psf, dtype=jnp.float32, pad_policy="ref"):
        return FFTConvolver.from_psf(psf, pad=True, norm="ortho", dtype=dtype,
                                     pad_policy=pad_policy)

    @nn.compact
    def __call__(self, conv: FFTConvolver, data: jax.Array, psf: jax.Array,
                 return_intermediates: bool = False):
        data = _promote_batch(data)
        dtype = data.dtype
        batch = data.shape[0]
        ch = conv.psf_shape[-1]

        # learnable per-iteration per-channel alpha, init 1.8/max|H|^2
        mag = conv.mag_sq()
        alpha0 = self.lip_fact / jnp.max(mag.reshape(-1, ch), axis=0)

        if self.learn_params:
            alpha = jnp.abs(self.param(
                "alpha", lambda _: jnp.ones((self.n_iter, ch), jnp.float32) * alpha0))
        else:
            alpha = jnp.ones((self.n_iter, ch), dtype) * alpha0

        tks = [self.tk]
        for i in range(self.n_iter):
            tks.append((1 + float(np.sqrt(1 + 4 * tks[i] ** 2))) / 2)
        tk_init = jnp.asarray(tks, jnp.float32)
        if self.learn_tk and self.learn_params:
            tk_seq = jnp.abs(self.param("tk", lambda _: tk_init))
        else:
            tk_seq = tk_init

        # half-intensity init (unrolled_fista.py:55-59)
        flat = psf.reshape(-1, ch)
        pixel_start = (jnp.max(flat, axis=0) + jnp.min(flat, axis=0)) / 2.0
        image = jnp.ones((batch,) + conv.psf_shape, dtype) * pixel_start

        def step(carry, per_iter):
            im, xk = carry
            a, tk_i, tk_ip1 = per_iter
            grad = conv.deconvolve(conv.convolve(im) - data)
            im = im - a * grad
            xk_new = self.proj(im)
            im = xk_new + (tk_i - 1.0) / tk_ip1 * (xk_new - xk)
            out = self.proj(im) if return_intermediates else None
            return (im, xk_new), out

        step_fn = jax.checkpoint(step) if self.remat else step
        (image, _), inters = jax.lax.scan(
            step_fn, (image, image), (alpha, tk_seq[:-1], tk_seq[1:])
        )
        if return_intermediates:
            return self.proj(image), [inters[i] for i in range(self.n_iter - 1)]
        return self.proj(image)
