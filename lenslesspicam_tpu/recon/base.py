"""User-facing reconstruction API mirroring the reference surface.

The reference exposes stateful solver objects with a three-step protocol
(lensless/recon/recon.py:179-205):

    recon = ADMM(psf)          # setup / "compile" phase
    recon.set_data(data)
    image = recon.apply(n_iter=100)

We keep that exact surface on top of the functional jit cores
(lenslesspicam_tpu.recon.admm / .gd): familiar to reference users, while
every apply() call runs a single compiled executable with a *dynamic*
iteration count (iteration sweeps don't recompile).

Returned images are numpy-convertible jax arrays shaped
``(depth, H, W, C)`` exactly like the reference's ``apply`` output.
"""

from __future__ import annotations

import abc

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fft_conv import FFTConvolver
from . import admm as _admm
from . import gd as _gd


class ReconstructionAlgorithm(abc.ABC):
    """Base class: PSF validation, data management, apply loop
    (recon.py:179-653)."""

    def __init__(self, psf, dtype=jnp.float32, n_iter=100, initial_est=None,
                 pad_policy="ref", **kwargs):
        psf = np.asarray(psf)
        assert psf.ndim == 4, "PSF must be 4D: (depth, height, width, channels)."
        assert psf.shape[3] in (1, 3), "PSF must be rgb (3) or grayscale (1)"
        self._psf = jnp.asarray(psf, dtype)
        self._psf_shape = tuple(psf.shape)
        self._npix = int(np.prod(psf.shape))
        self._n_iter = n_iter
        self._dtype = dtype
        self._pad_policy = pad_policy
        self._data = None
        self._initial_est = None
        if initial_est is not None:
            self._set_initial_estimate(initial_est)
        self._convolver = self._make_convolver(**kwargs)

    @abc.abstractmethod
    def _make_convolver(self, **kwargs) -> FFTConvolver:
        ...

    @abc.abstractmethod
    def _run(self, data, n_iter):
        """Return (batch, depth, H, W, C) reconstruction."""
        ...

    def set_data(self, data):
        """Set lensless measurement (recon.py:352-381); promotes to 5D."""
        data = jnp.asarray(data, self._dtype)
        assert data.ndim >= 3, "Data must be at least 3D: [..., H, W, C]."
        assert tuple(data.shape[-3:-1]) == self._psf_shape[-3:-1], "PSF and data shape mismatch"
        if data.ndim == 3:
            data = data[None, None]
        elif data.ndim == 4:
            data = data[None]
        self._data = data

    def _set_initial_estimate(self, image_est):
        image_est = jnp.asarray(image_est, self._dtype)
        assert image_est.ndim >= 4, "Initial estimate must be at least 4D"
        if image_est.ndim == 4:
            image_est = image_est[None]
        self._initial_est = image_est

    def apply(self, n_iter=None, background=None, disp_iter=None,
              plot=False, save=False, gamma=None, callback=None, **_ignored):
        """Run reconstruction; returns ``(depth, H, W, C)`` like the
        reference (recon.py:594 drops the batch dim).

        ``disp_iter`` chunks the solve with EXACT state continuation and
        after every chunk calls ``callback(image, iteration)`` and/or
        plots / saves the intermediate image (the reference's progress
        display, recon.py:500-560)."""
        assert self._data is not None, "Must set data with `set_data()`"
        assert self._data.shape[0] == 1, "apply() processes a single image; use batch_apply()"
        data = self._data
        if background is not None:
            data = jnp.maximum(data - jnp.asarray(background, self._dtype), 0.0)
        if n_iter is None:
            n_iter = self._n_iter
        if not disp_iter:
            return self._run(data, n_iter)[0]

        disp_iter = int(disp_iter)
        state = None
        done = 0
        image = None
        while done < n_iter:
            k = min(disp_iter, n_iter - done)
            image, state = self._run_chunk(data, k, state)
            done += k
            img0 = image[0]
            if callback is not None:
                callback(img0, done)
            if plot or save:
                self._display(img0, done, plot=plot, save=save, gamma=gamma)
        return image[0]

    def _run_chunk(self, data, k, state):
        """(image, state) after k more iterations from ``state`` (None =
        fresh).  Subclasses with resumable solvers override."""
        raise NotImplementedError(
            f"{type(self).__name__} does not support disp_iter chunking")

    def _display(self, img, iteration, plot=False, save=False, gamma=None):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from ..utils.plot import plot_image

        ax = plot_image(np.asarray(img), gamma=gamma)
        ax.set_title(f"iteration {iteration}")
        if save:
            fn = save if isinstance(save, str) else "."
            plt.savefig(f"{fn}/recon_iter{iteration}.png"
                        if not str(fn).endswith(".png") else fn)
        plt.close(ax.figure)

    def batch_apply(self, data, n_iter=None):
        """Batched reconstruction ``(B, D, H, W, C) -> (B, D, H, W, C)`` —
        a capability the reference's apply() lacks (recon.py:549-551)."""
        if n_iter is None:
            n_iter = self._n_iter
        return self._run(jnp.asarray(data, self._dtype), n_iter)

    def reconstruction_error(self, prediction, lensless, normalize=True):
        """Normalized ||Hx - y||^2 / npix per batch element
        (recon.py:607-653)."""
        conv = FFTConvolver.from_psf(self._psf, pad=True, norm=self._convolver.norm,
                                     dtype=self._dtype, pad_policy=self._pad_policy)
        prediction = jnp.asarray(prediction, self._dtype)
        if prediction.ndim == 4:
            prediction = prediction[None]
        lensless = jnp.asarray(lensless, self._dtype)
        if lensless.ndim == 4:
            lensless = lensless[None]
        Hx = conv.convolve(prediction)
        if normalize:
            mins = jnp.min(Hx, axis=(-1, -2, -3), keepdims=True)
            Hx = Hx - mins
            maxs = jnp.max(Hx, axis=(-1, -2, -3), keepdims=True)
            Hx = Hx / maxs
        return jnp.sum((Hx - lensless) ** 2, axis=(-1, -2, -3, -4)) / self._npix


class ADMM(ReconstructionAlgorithm):
    """ADMM with TV prior + non-negativity (lensless/recon/admm.py:24).

    Unlike the reference, 3-D (multi-depth) PSFs are supported: depths
    reconstruct independently (reference raises NotImplementedError).
    """

    def __init__(self, psf, dtype=jnp.float32, mu1=1e-6, mu2=1e-5, mu3=4e-5,
                 tau=1e-4, **kwargs):
        self._params = _admm.ADMMParams(mu1, mu2, mu3, tau)
        super().__init__(psf, dtype=dtype, **kwargs)

    def _make_convolver(self, **kwargs):
        return _admm.make_convolver(self._psf, dtype=self._dtype,
                                    pad_policy=self._pad_policy)

    def _run(self, data, n_iter):
        return _admm.run_jit(self._convolver, data, self._params,
                             jnp.asarray(n_iter), self._initial_est)

    def _run_chunk(self, data, k, state):
        if state is None and self._initial_est is not None:
            state = _admm.init_state(self._convolver, data.shape[0],
                                     self._convolver.pad_input(
                                         jnp.asarray(self._initial_est))[0]
                                     if self._initial_est.ndim == 5
                                     else self._initial_est, self._params)
        return _admm.run_state_jit(self._convolver, data, self._params,
                                   jnp.asarray(k), state)


class _GDBase(ReconstructionAlgorithm):
    _method = "vanilla"

    def __init__(self, psf, dtype=jnp.float32, lip_fact=1.8, mu=0.9, tk=1.0, **kwargs):
        self._config = _gd.GDConfig(lip_fact=lip_fact, mu=mu, tk=tk)
        super().__init__(psf, dtype=dtype, **kwargs)
        self._jit_run = jax.jit(
            lambda conv, psf, data, n_iter, init: _gd.run(
                conv, psf, data, n_iter, self._method, self._config, init
            )
        )

    def _make_convolver(self, **kwargs):
        return _gd.make_convolver(self._psf, dtype=self._dtype,
                                  pad_policy=self._pad_policy,
                                  norm=kwargs.get("norm", "ortho"))

    def _run(self, data, n_iter):
        return self._jit_run(self._convolver, self._psf, data,
                             jnp.asarray(n_iter), self._initial_est)

    def _run_chunk(self, data, k, state):
        if not hasattr(self, "_jit_chunk"):
            self._jit_chunk = jax.jit(
                lambda conv, psf, data, n, st: _gd.run(
                    conv, psf, data, n, self._method, self._config,
                    self._initial_est, initial_state=st, return_state=True))
        return self._jit_chunk(self._convolver, self._psf, data,
                               jnp.asarray(k), state)


class GradientDescent(_GDBase):
    """Projected gradient descent (gd.py:62-140)."""

    _method = "vanilla"


class NesterovGradientDescent(_GDBase):
    """Projected GD with Nesterov momentum (gd.py:143-188)."""

    _method = "nesterov"


class FISTA(_GDBase):
    """Projected GD with FISTA acceleration (gd.py:191-241)."""

    _method = "fista"


def apply_admm(psf, data, n_iter=100, **kwargs):
    """Convenience one-shot ADMM (admm.py:400-419 analog, in-memory)."""
    recon = ADMM(np.asarray(psf), **kwargs)
    recon.set_data(jnp.asarray(data))
    return recon.apply(n_iter=n_iter)
