"""Total-variation operators and the soft-threshold prox.

Behavioral parity with lensless/recon/admm.py:341-397 (soft_thresh,
finite_diff, finite_diff_adj, finite_diff_gram), as pure jnp functions on
the canonical ``(..., depth, H, W, C)`` layout.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def soft_thresh(x, thresh):
    """sign(x) * max(|x| - thresh, 0)  (admm.py:341-346)."""
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - thresh, 0.0)


def finite_diff(x):
    """Stack of circular forward differences along H and W, new trailing
    axis of size 2 (admm.py:349-359)."""
    return jnp.stack(
        (jnp.roll(x, 1, axis=-3) - x, jnp.roll(x, 1, axis=-2) - x),
        axis=x.ndim,
    )


def finite_diff_adj(u):
    """Adjoint of finite_diff (admm.py:362-370)."""
    d1 = jnp.roll(u[..., 0], -1, axis=-3) - u[..., 0]
    d2 = jnp.roll(u[..., 1], -1, axis=-2) - u[..., 1]
    return d1 + d2


def finite_diff_gram_spectrum(padded_shape, dtype=jnp.float32):
    """|rfft2(laplacian kernel)| on the padded grid, as a real array.

    The reference builds the explicit 4-point (2-D) Laplacian kernel and
    rfft2s it (admm.py:373-397); ADMM only ever consumes its magnitude
    (admm.py:188,223), so we return the real magnitude directly.  The
    reference's 6-point 3-D branch is dead code (3-D ADMM raises
    NotImplementedError, admm.py:92-96); our 3-D ADMM treats depths
    independently, so the per-depth 4-point kernel is the correct gram.
    """
    depth, ph, pw, ch = padded_shape
    # closed form of |rfft2(4-point laplacian)|: the kernel's transform
    # is 4 - 2cos(2*pi*ky/ph) - 2cos(2*pi*kx/pw), real and >= 0, so the
    # magnitude IS the value.  Computed in-graph (iota + cos) instead of
    # materializing a numpy constant: at 12 MP RGB the host-side array
    # was a 302 MB HLO constant — over the remote-compile request limit
    # (docs/tpu_runtime_notes.md HTTP-413 trap).
    wy = 2.0 * np.pi * jnp.arange(ph, dtype=jnp.float32) / ph
    wx = 2.0 * np.pi * jnp.arange(pw // 2 + 1, dtype=jnp.float32) / pw
    spec = (4.0 - 2.0 * jnp.cos(wy)[:, None] - 2.0 * jnp.cos(wx)[None, :])
    spec = jnp.maximum(spec, 0.0).astype(dtype)
    return jnp.broadcast_to(spec[None, :, :, None],
                            (depth, ph, pw // 2 + 1, ch))
