"""Spatially-sharded reconstruction: distributed FFT convolution + ADMM.

The reference handles large sensors only by downsampling (SURVEY §5.7);
padded 12 MP ADMM state (~10 live grids of 6144 x 8192) exceeds a single
chip once RGB.  Here the padded grid's row axis is sharded over a mesh
axis ``sp`` and the whole solver runs under ``shard_map``:

* ``filtered_synthesis_sharded`` — pencil-decomposition 2-D real FFT
  filter application: local rFFT along W, ``all_to_all`` transpose to
  shard the half-spectrum's W axis, local FFT along (now-complete) H,
  spectrum multiply, inverse chain.  Two all-to-alls per application
  ride the ICI instead of materializing the full grid anywhere;
* TV finite differences at shard boundaries use one-row halo exchanges
  via ``ppermute`` (circular, matching the reference's periodic
  ``jnp.roll`` semantics);
* all elementwise ADMM updates are embarrassingly local.

The half-spectrum W axis (Pw//2 + 1) is zero-padded up to a multiple of
the shard count; padded columns carry zeros through the linear chain and
are sliced off before the inverse rFFT.

Tests assert exact (1e-5) consistency with the single-device solver on
an 8-device mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.fft_conv import FFTConvolver
from ..ops.tv import finite_diff_gram_spectrum, soft_thresh
from ..recon.admm import ADMMParams

AXIS = "sp"


def _nsp():
    return jax.lax.axis_size(AXIS)


def _my_idx():
    return jax.lax.axis_index(AXIS)


# ---------------------------------------------------------------------------
# distributed filter application (rfft2 -> multiply -> irfft2)
# ---------------------------------------------------------------------------


def _pad_cols(x, total):
    pad = total - x.shape[-2]
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[-2] = (0, pad)
    return jnp.pad(x, cfg)


def filtered_synthesis_sharded(x_local, H_local, ph, pw, n_shards):
    """irfft2(rfft2(x) * H) with row-sharded x (inside shard_map).

    x_local: (..., ph / n_shards, pw, C) real
    H_local: (..., ph, pwh_padded / n_shards, C) complex or real — the
        spectrum sharded along its (padded) half-W axis.
    """
    pwh = pw // 2 + 1
    pwh_pad = -(-pwh // n_shards) * n_shards

    # 1. local rFFT along W -> (..., ph/P, pwh, C), pad cols to P multiple
    fw = jnp.fft.rfft(x_local, axis=-2)
    fw = _pad_cols(fw, pwh_pad)

    # 2. all-to-all: split half-W axis across shards, gather rows
    #    (..., ph/P, pwh_pad, C) -> (..., ph, pwh_pad/P, C)
    fw = jax.lax.all_to_all(fw, AXIS, split_axis=fw.ndim - 2,
                            concat_axis=fw.ndim - 3, tiled=True)

    # 3. local FFT along complete H + spectrum multiply
    fh = jnp.fft.fft(fw, axis=-3)
    fh = fh * H_local

    # 4. inverse chain
    fh = jnp.fft.ifft(fh, axis=-3)
    fh = jax.lax.all_to_all(fh, AXIS, split_axis=fh.ndim - 3,
                            concat_axis=fh.ndim - 2, tiled=True)
    fh = fh[..., :pwh, :]
    return jnp.fft.irfft(fh, n=pw, axis=-2)


# ---------------------------------------------------------------------------
# halo-exchange rolls (periodic finite differences across shards)
# ---------------------------------------------------------------------------


def _ppermute_shift(rows, forward: bool):
    n = _nsp()
    perm = [((i + 1) % n, i) for i in range(n)] if not forward else \
           [(i, (i + 1) % n) for i in range(n)]
    return jax.lax.ppermute(rows, AXIS, perm)


def roll_down_sharded(x):
    """Global jnp.roll(x, +1, axis=-3) for row-sharded x: each shard
    receives its predecessor's last row."""
    last = x[..., -1:, :, :]
    prev_last = _ppermute_shift(last, forward=True)
    return jnp.concatenate([prev_last, x[..., :-1, :, :]], axis=-3)


def roll_up_sharded(x):
    """Global jnp.roll(x, -1, axis=-3): each shard receives its
    successor's first row."""
    first = x[..., :1, :, :]
    next_first = _ppermute_shift(first, forward=False)
    return jnp.concatenate([x[..., 1:, :, :], next_first], axis=-3)


def finite_diff_sharded(x):
    """(roll_h - x, roll_w - x) stacked (ops/tv.py finite_diff)."""
    return jnp.stack(
        (roll_down_sharded(x) - x, jnp.roll(x, 1, axis=-2) - x), axis=x.ndim
    )


def finite_diff_adj_sharded(u):
    d1 = roll_up_sharded(u[..., 0]) - u[..., 0]
    d2 = jnp.roll(u[..., 1], -1, axis=-2) - u[..., 1]
    return d1 + d2


# ---------------------------------------------------------------------------
# spatially-sharded ADMM
# ---------------------------------------------------------------------------


def spatial_sharded_admm(mesh: Mesh, conv: FFTConvolver, data,
                         params: ADMMParams = ADMMParams(), n_iter: int = 100):
    """Full ADMM with every state grid row-sharded over mesh axis 'sp'.

    Returns the cropped (batch, depth, H, W, C) reconstruction,
    row-sharded on the same axis.
    """
    assert AXIS in mesh.axis_names
    # the sharded synthesis chain has no trailing ifftshift roll; the
    # shift must be folded into H (even padded dims — true for the
    # 'tpu' pad policy always, and for 'ref' at most sizes).  Otherwise
    # the output would be silently rolled vs. admm.run.
    assert conv.shift_folded, (
        "spatial_sharded_admm requires an even-padded convolver "
        "(conv.shift_folded); rebuild the convolver with pad_policy='tpu'"
    )
    n_shards = mesh.shape[AXIS]
    depth, ph, pw, ch = conv.padded_shape
    assert ph % n_shards == 0, f"padded height {ph} must divide {n_shards}"
    pwh = pw // 2 + 1
    pwh_pad = -(-pwh // n_shards) * n_shards
    dtype = conv.H.real.dtype

    # global preparation (host/eager, sharded placement after)
    data = jnp.asarray(data, dtype)
    if data.ndim == 3:
        data = data[None, None]
    elif data.ndim == 4:
        data = data[None]
    data_pad = conv.pad_input(data)

    psi_tpsi = finite_diff_gram_spectrum(conv.padded_shape, dtype)
    R_divmat = 1.0 / (params.mu1 * conv.mag_sq() + params.mu2 * psi_tpsi + params.mu3)
    X_divmat = 1.0 / (conv.pad_input(jnp.ones((depth, conv.psf_shape[-3],
                                               conv.psf_shape[-2], ch), dtype))
                      + params.mu1)
    H_pad = _pad_cols(conv.H, pwh_pad)
    R_pad = _pad_cols(R_divmat.astype(dtype), pwh_pad)

    row_sharding = NamedSharding(mesh, P(None, None, AXIS))
    spec_sharding = NamedSharding(mesh, P(None, None, AXIS))  # shard half-W axis

    H_s = jax.device_put(H_pad, NamedSharding(mesh, P(None, None, AXIS)))
    R_s = jax.device_put(R_pad, NamedSharding(mesh, P(None, None, AXIS)))
    Xdiv_s = jax.device_put(X_divmat, NamedSharding(mesh, P(None, AXIS)))
    data_s = jax.device_put(data_pad, NamedSharding(mesh, P(None, None, AXIS)))

    mu1, mu2, mu3, tau = (params.mu1, params.mu2, params.mu3, params.tau)

    @functools.partial(
        jax.jit,
        static_argnames=(),
    )
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, None, AXIS), P(None, None, AXIS), P(None, AXIS),
                  P(None, None, AXIS)),
        out_specs=P(None, None, AXIS),
    )
    def run(H_l, R_l, Xdiv_l, data_l):
        def conv_apply(v, filt):
            return filtered_synthesis_sharded(v, filt, ph, pw, n_shards)

        # derive zeros from data_l so the carry is marked device-varying
        # over 'sp' from iteration 0 (shard_map type system)
        zeros = data_l * 0.0
        zeros2 = zeros[..., None] * jnp.zeros((2,), dtype)
        state = dict(
            image=zeros, X=zeros, W=zeros, xi=zeros, rho=zeros,
            U=zeros2, eta=zeros2, forward_out=zeros, psi_out=zeros2,
        )

        def body(_, s):
            U = soft_thresh(s["psi_out"] + s["eta"] / mu2, tau / mu2)
            X = Xdiv_l * (s["xi"] + mu1 * s["forward_out"] + data_l)
            W = jnp.maximum(s["rho"] / mu3 + s["image"], 0.0)
            rk = (
                (mu3 * W - s["rho"])
                + finite_diff_adj_sharded(mu2 * U - s["eta"])
                + conv_apply(mu1 * X - s["xi"], jnp.conj(H_l))
            )
            image = conv_apply(rk, R_l)
            forward_out = conv_apply(image, H_l)
            psi_out = finite_diff_sharded(image)
            return dict(
                image=image, X=X, W=W,
                xi=s["xi"] + mu1 * (forward_out - X),
                rho=s["rho"] + mu3 * (image - W),
                U=U,
                eta=s["eta"] + mu2 * (psi_out - U),
                forward_out=forward_out,
                psi_out=psi_out,
            )

        state = jax.lax.fori_loop(0, n_iter, body, state)
        return jnp.maximum(state["image"], 0.0)

    padded = run(H_s, R_s, Xdiv_s, data_s)
    return conv.crop(padded)
