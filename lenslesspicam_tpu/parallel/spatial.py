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
import re

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import pallas_fft as pf
from ..ops.fft_conv import FFTConvolver
from ..ops.tv import finite_diff_gram_spectrum, soft_thresh
from ..recon.admm import ADMMParams
from .distributed import put_global

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
                         params: ADMMParams = ADMMParams(), n_iter: int = 100,
                         backend: str = "auto", batch_axis: str | None = None):
    """Full ADMM with every state grid row-sharded over mesh axis 'sp'.

    Returns the cropped (batch, depth, H, W, C) reconstruction,
    row-sharded on the same axis.

    batch_axis: optional second mesh axis to shard the BATCH dim over —
        the multi-host layout (parallel/distributed.py): batch over the
        process-spanning 'data' axis (one gradient-free solve per host,
        zero cross-host traffic), rows over the in-host 'sp' axis whose
        per-iteration all_to_alls stay on ICI.  XLA backend only.

    backend: "xla" — jnp.fft pencil stages (any shape);
             "rpallas" — half-spectrum packed-real Pallas pencil
             pipeline (:func:`spatial_sharded_admm_rpallas`): half-width
             all_to_alls, fused dual-inverse H chain, carry-rebuild
             state — the fastest path;
             "pallas" — full-width split-order matmul-FFT kernels
             (:func:`spatial_sharded_admm_pallas`);
             "auto" — rpallas on TPU when the padded grid divides the
             mesh and Mosaic accepts the tile shapes, else the
             full-width pallas path, else xla.
    """
    if backend == "auto":
        if batch_axis is None and _pallas_rspatial_ok(mesh, conv):
            backend = "rpallas"
        elif batch_axis is None and _pallas_spatial_ok(mesh, conv):
            backend = "pallas"
        else:
            backend = "xla"
    if backend == "rpallas":
        assert batch_axis is None, "batch_axis: xla backend only"
        return spatial_sharded_admm_rpallas(mesh, conv, data, params, n_iter)
    if backend == "pallas":
        assert batch_axis is None, "batch_axis: xla backend only"
        return spatial_sharded_admm_pallas(mesh, conv, data, params, n_iter)
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

    # placements via put_global: identical to device_put single-process,
    # and valid across processes on a multi-host mesh
    ba = batch_axis  # data (B, D, ph, pw, C): dim 0 rides the DCN axis
    H_s = put_global(H_pad, NamedSharding(mesh, P(None, None, AXIS)))
    R_s = put_global(R_pad, NamedSharding(mesh, P(None, None, AXIS)))
    Xdiv_s = put_global(X_divmat, NamedSharding(mesh, P(None, AXIS)))
    data_s = put_global(data_pad, NamedSharding(mesh, P(ba, None, AXIS)))

    mu1, mu2, mu3, tau = (params.mu1, params.mu2, params.mu3, params.tau)

    @functools.partial(
        jax.jit,
        static_argnames=(),
    )
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, None, AXIS), P(None, None, AXIS), P(None, AXIS),
                  P(ba, None, AXIS)),
        out_specs=P(ba, None, AXIS),
    )
    def run(H_l, R_l, Xdiv_l, data_l):
        def conv_apply(v, filt):
            return filtered_synthesis_sharded(v, filt, ph, pw, n_shards)

        # derive zeros from data_l so the carry is marked device-varying
        # over 'sp' from iteration 0 (shard_map type system).
        # Carry-rebuild state (recon/admm_split.run_split_fused): the
        # accumulating duals are rebuilt each iteration from one
        # identity each — xi = mu1*fwd - v, rho = mu3*image - b,
        # eta = mu2*psi - a — halving carried state memory, which is
        # exactly what the spatial sharding exists to economize.
        zeros = data_l * 0.0
        zeros2 = zeros[..., None] * jnp.zeros((2,), dtype)
        state = dict(image=zeros, forward_out=zeros, v=zeros, b=zeros,
                     a=zeros2)

        def body(_, s):
            psi = finite_diff_sharded(s["image"])
            eta_eff = mu2 * psi - s["a"]
            U = soft_thresh(psi + eta_eff / mu2, tau / mu2)
            a = mu2 * U - eta_eff
            xi = mu1 * s["forward_out"] - s["v"]
            X = Xdiv_l * (xi + mu1 * s["forward_out"] + data_l)
            v = mu1 * X - xi
            rho = mu3 * s["image"] - s["b"]
            W = jnp.maximum(rho / mu3 + s["image"], 0.0)
            b = mu3 * W - rho
            rk = b + finite_diff_adj_sharded(a) \
                 + conv_apply(v, jnp.conj(H_l))
            image = conv_apply(rk, R_l)
            forward_out = conv_apply(image, H_l)
            return dict(image=image, forward_out=forward_out, v=v, b=b,
                        a=a)

        state = jax.lax.fori_loop(0, n_iter, body, state)
        return jnp.maximum(state["image"], 0.0)

    padded = run(H_s, R_s, Xdiv_s, data_s)
    return conv.crop(padded)


# ---------------------------------------------------------------------------
# Pallas-backed spatial sharding: the split-order matmul-FFT kernels
# (ops/pallas_kernels2.py) composed with the pencil decomposition.
#
# Per 2-D transform: local W-axis kernel (fft_w) on the row shard, ONE
# all_to_all re-pencils the split-order W spectrum across chips, local
# H-axis kernels (fft_h / ifft_h with the filter fused) on complete
# columns, inverse all_to_all, local ifft_w.  The multi-chip solver
# therefore inherits the single-HBM-pass-per-transform economy of the
# single-chip backend instead of XLA's ~13-radix-pass FFT — each
# iteration is 4 kernel chains + 4 all_to_alls riding the ICI, plus the
# one-row ppermute halos for the TV term.  Split order needs no
# re-ordering for the collectives: all_to_all moves contiguous chunks
# of the split-order axis, and the filter spectra are pre-sharded in
# the same chunked layout (elementwise multiplies are
# permutation-invariant).
#
# Layout inside shard_map: plane-major (B, P=D*C, rows_local, Pw) so the
# strictly-2-D Pallas kernels vmap over (B, P) — each vmap level adds a
# grid dimension to the kernel, exactly like the batched single-chip
# backend (recon/admm_split.run_rsplit_general).
#
# No reference counterpart: the reference downsamples instead of
# scaling out (SURVEY §5.7); this is the flagship new capability.
# ---------------------------------------------------------------------------


def _pallas_spatial_ok(mesh: Mesh, conv: FFTConvolver) -> bool:
    """True when the pallas pencil path can run: padded dims divide the
    'sp' axis, and on real TPU the Mosaic tile-alignment rules hold."""
    from ..ops import pallas_kernels2 as pk2

    if AXIS not in mesh.axis_names:
        return False
    n = mesh.shape[AXIS]
    depth, ph, pw, ch = conv.padded_shape
    if ph % n or pw % n or not conv.shift_folded:
        return False
    if jax.devices()[0].platform != "tpu":
        return False  # interpret-mode pallas is test-only, not a default
    return pk2.complex_mosaic_ok(ph, pw, pw // n)


def _full_from_half(half: np.ndarray, pw: int) -> np.ndarray:
    """(Ph, Pw//2+1) natural-order half-spectrum of a REAL kernel ->
    (Ph, Pw) full spectrum via hermitian symmetry
    X[h, w] = conj(X[(-h) % Ph, Pw - w])."""
    ph, pwh = half.shape
    full = np.zeros((ph, pw), half.dtype)
    full[:, :pwh] = half
    wrest = np.arange(pwh, pw)
    rows = (-np.arange(ph)) % ph
    full[:, pwh:] = np.conj(half[rows][:, pw - wrest])
    return full


def spatial_sharded_admm_pallas(mesh: Mesh, conv: FFTConvolver, data,
                                params: ADMMParams = ADMMParams(),
                                n_iter: int = 100):
    """Row-sharded ADMM whose distributed FFTs run on the split-order
    Pallas kernels (see module comment above).  Same algebra as
    :func:`spatial_sharded_admm` / recon/admm_split.run_split: the
    4-transform iteration F = R * (A + conj(H) B) with TV halos.

    On non-TPU platforms the kernels execute in interpret mode (slow;
    used by the 8-device CPU-mesh shard-consistency tests)."""
    from ..ops import pallas_kernels2 as pk2

    assert AXIS in mesh.axis_names
    assert conv.shift_folded, (
        "spatial_sharded_admm_pallas requires an even-padded convolver")
    n_shards = mesh.shape[AXIS]
    depth, ph, pw, ch = conv.padded_shape
    assert ph % n_shards == 0 and pw % n_shards == 0, (
        f"padded dims {(ph, pw)} must divide the {n_shards}-way 'sp' axis")
    nplanes = depth * ch
    mu1, mu2, mu3, tau = params.mu1, params.mu2, params.mu3, params.tau

    # ---- host-side spectra: full-width, split order on both axes ----
    # (complex64 d2h is unimplemented on the axon tunnel: fetch r/i parts)
    H_half = (np.asarray(jnp.real(conv.H))
              + 1j * np.asarray(jnp.imag(conv.H))).astype(np.complex64)
    psi_full = _psi_gram_full(ph, pw)
    H_pl = np.empty((nplanes, ph, pw), np.complex64)
    R_pl = np.empty((nplanes, ph, pw), np.float32)
    for d in range(depth):
        for c in range(ch):
            Hf = _full_from_half(H_half[d, :, :, c], pw)
            Rf = 1.0 / (mu1 * np.abs(Hf) ** 2 + mu2 * psi_full + mu3)
            H_pl[d * ch + c] = pf.spectrum_to_split(Hf, axes=(0, 1))
            R_pl[d * ch + c] = pf.spectrum_to_split(
                Rf.astype(np.float32), axes=(0, 1))

    # ---- plane-major data + fidelity weights ----
    dtype = jnp.float32
    data = jnp.asarray(data, dtype)
    if data.ndim == 3:
        data = data[None, None]
    elif data.ndim == 4:
        data = data[None]
    batch = data.shape[0]
    data_pad = conv.pad_input(data)                  # (B, D, Ph, Pw, C)
    data_pl = jnp.moveaxis(data_pad, -1, 2).reshape(batch, nplanes, ph, pw)
    ones = conv.pad_input(jnp.ones((depth,) + conv.psf_shape[-3:-1] + (ch,),
                                   dtype))
    Xdiv_pl = jnp.moveaxis(1.0 / (ones + mu1), -1, 1).reshape(nplanes, ph, pw)

    spec_sh = NamedSharding(mesh, P(None, None, AXIS))   # cols of spectrum
    row3_sh = NamedSharding(mesh, P(None, AXIS))         # rows, (P, Ph, Pw)
    row4_sh = NamedSharding(mesh, P(None, None, AXIS))   # rows, (B, P, ...)
    Hr_s = jax.device_put(jnp.asarray(np.ascontiguousarray(H_pl.real)), spec_sh)
    Hi_s = jax.device_put(jnp.asarray(np.ascontiguousarray(H_pl.imag)), spec_sh)
    R_s = jax.device_put(jnp.asarray(R_pl), spec_sh)
    Xdiv_s = jax.device_put(Xdiv_pl, row3_sh)
    data_s = jax.device_put(data_pl, row4_sh)

    interpret = jax.devices()[0].platform != "tpu"
    run = _build_pallas_run(mesh, ph, params, n_iter)

    with pk2.forced_interpret(interpret):
        padded_pl = run(Hr_s, Hi_s, R_s, Xdiv_s, data_s)
    padded = jnp.moveaxis(
        padded_pl.reshape(batch, depth, ch, ph, pw), 2, -1)
    return conv.crop(padded)


def _build_pallas_run(mesh: Mesh, ph: int, params: ADMMParams, n_iter: int):
    """The jitted shard_map'd plane-major pallas ADMM loop; factored out
    so the multi-chip dryrun can abstractly evaluate it at the 12
    MP-padded grid shape (jax.eval_shape) without host-side spectra."""
    from ..ops import pallas_kernels2 as pk2

    mu1, mu2, mu3, tau = params.mu1, params.mu2, params.mu3, params.tau

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, None, AXIS), P(None, None, AXIS),
                  P(None, None, AXIS), P(None, AXIS), P(None, None, AXIS)),
        out_specs=P(None, None, AXIS),
        # pallas_call out_shapes carry no vma annotation; the collective
        # structure is fixed by the explicit all_to_all/ppermute calls
        check_vma=False,
    )
    def run(Hr_l, Hi_l, R_l, Xdiv_l, data_l):
        # vmap the 2-D kernels over (B, P); filters broadcast over B
        vm_w = jax.vmap(jax.vmap(pk2.fft_w))
        vm_iw = jax.vmap(jax.vmap(pk2.ifft_w))
        vm_h = jax.vmap(jax.vmap(lambda r, i: pk2.fft_h(r, i, ph)))
        vm_ih = jax.vmap(jax.vmap(lambda r, i: pk2.ifft_h(r, i, ph)))

        def a2a_fwd(x):   # (B, P, rows, Pw) -> (B, P, Ph, cols)
            return jax.lax.all_to_all(x, AXIS, split_axis=3, concat_axis=2,
                                      tiled=True)

        def a2a_inv(x):
            return jax.lax.all_to_all(x, AXIS, split_axis=2, concat_axis=3,
                                      tiled=True)

        def fwd2(x):
            wr, wi = vm_w(x)
            return vm_h(a2a_fwd(wr), a2a_fwd(wi))

        def inv2(vr, vi):
            br, bi = vm_ih(vr, vi)
            return vm_iw(a2a_inv(br), a2a_inv(bi))

        def roll_rows(x, up):
            if up:   # jnp.roll(x, -1, axis=-2) globally
                first = _ppermute_shift(x[..., :1, :], forward=False)
                return jnp.concatenate([x[..., 1:, :], first], axis=-2)
            last = _ppermute_shift(x[..., -1:, :], forward=True)
            return jnp.concatenate([last, x[..., :-1, :]], axis=-2)

        # carry-rebuild state (see spatial_sharded_admm)
        zeros = data_l * 0.0
        state = dict(image=zeros, forward_out=zeros, v=zeros, b=zeros,
                     a0=zeros, a1=zeros)

        def body(_, s):
            psi0 = roll_rows(s["image"], up=False) - s["image"]
            psi1 = jnp.roll(s["image"], 1, axis=-1) - s["image"]
            eta0_eff = mu2 * psi0 - s["a0"]
            eta1_eff = mu2 * psi1 - s["a1"]
            U0 = soft_thresh(psi0 + eta0_eff / mu2, tau / mu2)
            U1 = soft_thresh(psi1 + eta1_eff / mu2, tau / mu2)
            a0 = mu2 * U0 - eta0_eff
            a1 = mu2 * U1 - eta1_eff
            xi = mu1 * s["forward_out"] - s["v"]
            X = Xdiv_l * (xi + mu1 * s["forward_out"] + data_l)
            v = mu1 * X - xi
            rho = mu3 * s["image"] - s["b"]
            W = jnp.maximum(rho / mu3 + s["image"], 0.0)
            b = mu3 * W - rho
            rk = (b
                  + (roll_rows(a0, up=True) - a0)
                  + (jnp.roll(a1, -1, axis=-1) - a1))

            ar, ai = fwd2(rk)
            br, bi = fwd2(v)
            fr = R_l * (ar + Hr_l * br + Hi_l * bi)
            fi = R_l * (ai + Hr_l * bi - Hi_l * br)
            image = inv2(fr, fi)
            forward_out = inv2(fr * Hr_l - fi * Hi_l,
                               fr * Hi_l + fi * Hr_l)
            return dict(image=image, forward_out=forward_out, v=v, b=b,
                        a0=a0, a1=a1)

        state = jax.lax.fori_loop(0, n_iter, body, state)
        return jnp.maximum(state["image"], 0.0)

    return run


def _psi_gram_full(ph: int, pw: int) -> np.ndarray:
    """|fft2| of the 4-point laplacian on the FULL (Ph, Pw) grid
    (full-width analog of ops/tv.finite_diff_gram_spectrum)."""
    kern = np.zeros((ph, pw), np.float64)
    kern[0, 0] = 4.0
    kern[0, 1] = kern[0, -1] = kern[1, 0] = kern[-1, 0] = -1.0
    return np.abs(np.fft.fft2(kern)).astype(np.float32)


# ---------------------------------------------------------------------------
# half-spectrum (packed-real) pencil backend — the round-2/3 single-chip
# kernel pipeline ported to the sharded solver:
#
# * packed-real W transforms (pk2.rfft_w / irfft_w_dual): every
#   all_to_all payload HALVES vs the full-width pencil path (a real
#   plane's W spectrum rides as (rows, Pw/2) r/i instead of (rows, Pw));
# * ONE fused H-axis kernel chain (pk2.fft_h_combine_dual) runs the
#   forward H transform of both planes, the ADMM spectrum combine
#   F = R (A + conj(H) B), the H-filter multiply, and the dual inverse
#   H transform — the combined spectrum never crosses HBM;
# * dual W-inverse (pk2.irfft_w_dual) produces image and forward
#   estimate from one kernel, with the exact DC/Nyquist packed-lane
#   patch applied in-kernel;
# * per iteration: 2 kernel-chain transforms + 2 all_to_alls (vs the
#   full-width path's 4 transforms + 4 a2a pairs) + one tiny all_gather
#   (the (Ph,)-column DC/Nyquist patch inputs) + 2 one-row ppermutes
#   (TV halos).  The rk/v forward spectra ride ONE stacked a2a, the
#   image/forward inverse spectra the other.
#
# The carry-rebuild state scheme (duals never stored) is inherited from
# the XLA elementwise block.  Exact-consistency tested vs the
# single-device solver on the 8-device CPU mesh.
# ---------------------------------------------------------------------------


def _split_roll_p1_last(x, mh):
    """jnp.roll(+1) along the natural W axis for split-lane-layout
    last-axis planes (axis-last analog of pk2._split_roll_p1)."""
    ev, od = x[..., :mh], x[..., mh:]
    od_r = jnp.concatenate([od[..., -1:], od[..., :-1]], axis=-1)
    return jnp.concatenate([od_r, ev], axis=-1)


def _split_roll_m1_last(x, mh):
    ev, od = x[..., :mh], x[..., mh:]
    ev_r = jnp.concatenate([ev[..., 1:], ev[..., :1]], axis=-1)
    return jnp.concatenate([od, ev_r], axis=-1)


def _to_split_last(x):
    return jnp.concatenate([x[..., 0::2], x[..., 1::2]], axis=-1)


def _from_split_last(x):
    mh = x.shape[-1] // 2
    return jnp.stack([x[..., :mh], x[..., mh:]],
                     axis=-1).reshape(*x.shape[:-1], 2 * mh)


def _pallas_rspatial_ok(mesh: Mesh, conv: FFTConvolver) -> bool:
    """True when the half-spectrum pencil path can run: even padded
    dims, rows and the half-W axis divide the 'sp' axis, and on real
    TPU the Mosaic tile-alignment rules hold for both the packed-real
    W kernels (full local Pw) and the H kernels (Pw/2/n-wide pencils)."""
    from ..ops import pallas_kernels2 as pk2
    from ..ops.pallas_fft import _factor

    if AXIS not in mesh.axis_names:
        return False
    n = mesh.shape[AXIS]
    depth, ph, pw, ch = conv.padded_shape
    mh = pw // 2
    if pw % 2 or ph % n or mh % n or not conv.shift_folded:
        return False
    if jax.devices()[0].platform != "tpu":
        return False  # interpret-mode pallas is test-only, not a default
    cols = mh // n
    n1h, n2h = _factor(ph)
    return (pk2.rfused_mosaic_ok(ph, pw) and cols % 128 == 0
            and n2h % 128 == 0 and n1h % 8 == 0)


def spatial_sharded_admm_rpallas(mesh: Mesh, conv: FFTConvolver, data,
                                 params: ADMMParams = ADMMParams(),
                                 n_iter: int = 100):
    """Row-sharded ADMM on the half-spectrum packed-real pencil backend
    (see block comment above).  Same algebra and output as
    :func:`spatial_sharded_admm`.

    On non-TPU platforms the kernels execute in interpret mode (slow;
    used by the 8-device CPU-mesh shard-consistency tests)."""
    from ..ops import pallas_kernels2 as pk2

    assert AXIS in mesh.axis_names
    assert conv.shift_folded, (
        "spatial_sharded_admm_rpallas requires an even-padded convolver")
    n_shards = mesh.shape[AXIS]
    depth, ph, pw, ch = conv.padded_shape
    mh = pw // 2
    assert pw % 2 == 0 and ph % n_shards == 0 and mh % n_shards == 0, (
        f"padded dims {(ph, pw)} must divide the {n_shards}-way 'sp' axis")
    nplanes = depth * ch
    mu1, mu2, mu3 = params.mu1, params.mu2, params.mu3

    # ---- host-side per-plane half-spectra (split order both axes) +
    # the exact DC (kw=0) / Nyquist (kw=M) patch columns (natural H) ----
    H_half_dev = (np.asarray(jnp.real(conv.H))
                  + 1j * np.asarray(jnp.imag(conv.H))).astype(np.complex64)
    psi_full = _psi_gram_full(ph, pw)
    Hr_pl = np.empty((nplanes, ph, mh), np.float32)
    Hi_pl = np.empty((nplanes, ph, mh), np.float32)
    R_pl = np.empty((nplanes, ph, mh), np.float32)
    H0_pl = np.empty((nplanes, ph), np.complex64)
    HM_pl = np.empty((nplanes, ph), np.complex64)
    R0_pl = np.empty((nplanes, ph), np.float32)
    RM_pl = np.empty((nplanes, ph), np.float32)
    for d in range(depth):
        for c in range(ch):
            Hf = _full_from_half(H_half_dev[d, :, :, c], pw)
            Rf = (1.0 / (mu1 * np.abs(Hf) ** 2 + mu2 * psi_full + mu3)
                  ).astype(np.float32)
            k = d * ch + c
            Hh = pf.spectrum_to_half_split(Hf)
            Hr_pl[k], Hi_pl[k] = Hh.real, Hh.imag
            R_pl[k] = pf.spectrum_to_half_split(Rf).real
            H0_pl[k], HM_pl[k] = Hf[:, 0], Hf[:, mh]
            R0_pl[k], RM_pl[k] = Rf[:, 0], Rf[:, mh]

    # ---- plane-major split-layout data + fidelity weights ----
    dtype = jnp.float32
    data = jnp.asarray(data, dtype)
    if data.ndim == 3:
        data = data[None, None]
    elif data.ndim == 4:
        data = data[None]
    batch = data.shape[0]
    data_pad = conv.pad_input(data)
    data_pl = _to_split_last(
        jnp.moveaxis(data_pad, -1, 2).reshape(batch, nplanes, ph, pw))
    ones = conv.pad_input(jnp.ones((depth,) + conv.psf_shape[-3:-1] + (ch,),
                                   dtype))
    Xdiv_pl = _to_split_last(
        jnp.moveaxis(1.0 / (ones + mu1), -1, 1).reshape(nplanes, ph, pw))

    pencil_sh = NamedSharding(mesh, P(None, None, AXIS))  # (P, Ph, cols)
    row3_sh = NamedSharding(mesh, P(None, AXIS))          # (P, rows, Pw)
    row4_sh = NamedSharding(mesh, P(None, None, AXIS))    # (B, P, rows, Pw)
    rep_sh = NamedSharding(mesh, P())                     # replicated cols
    Hr_s = jax.device_put(jnp.asarray(Hr_pl), pencil_sh)
    Hi_s = jax.device_put(jnp.asarray(Hi_pl), pencil_sh)
    R_s = jax.device_put(jnp.asarray(R_pl), pencil_sh)
    Xdiv_s = jax.device_put(Xdiv_pl, row3_sh)
    data_s = jax.device_put(data_pl, row4_sh)
    patch = tuple(
        jax.device_put(jnp.asarray(a), rep_sh)
        for a in (H0_pl.real, H0_pl.imag, HM_pl.real, HM_pl.imag,
                  R0_pl, RM_pl))

    interpret = jax.devices()[0].platform != "tpu"
    run = _build_rpallas_run(mesh, ph, pw, params, n_iter)

    with pk2.forced_interpret(interpret):
        padded_pl = run(Hr_s, Hi_s, R_s, Xdiv_s, data_s, *patch)
    padded = jnp.moveaxis(
        _from_split_last(padded_pl).reshape(batch, depth, ch, ph, pw), 2, -1)
    return conv.crop(padded)


def ici_traffic_model(ph: int, pw: int, n_shards: int, nplanes: int = 1,
                      batch: int = 1, bytes_per_el: int = 4) -> dict:
    """Modeled per-iteration ICI traffic of the half-spectrum pencil
    solver at a padded grid: 2 stacked all_to_alls of 4 half-width
    planes each (each device sends (n-1)/n of its shard), one (Ph,)
    all_gather x 4 columns, and 2 one-row ppermutes (the image halo for
    the row-axis TV forward diff and the a0 halo for its adjoint; the
    compiled HLO confirms exactly 2 collective-permutes per iteration —
    see :func:`hlo_collective_bytes_per_iter`).  Returned dict is what
    ``__graft_entry__.dryrun_multichip`` records; the dryrun also
    audits it against the compiled program's actual collective bytes."""
    mh = pw // 2
    frac = (n_shards - 1) / n_shards
    a2a_bytes = 2 * (4 * batch * nplanes * (ph // n_shards) * mh
                     * bytes_per_el) * frac
    gather_bytes = 4 * batch * nplanes * ph * bytes_per_el * frac
    halo_bytes = 2 * batch * nplanes * pw * bytes_per_el
    full_width_a2a = 2 * a2a_bytes  # the full-width pencil path's cost
    return {
        "a2a_bytes_per_iter": a2a_bytes,
        "gather_bytes_per_iter": gather_bytes,
        "halo_bytes_per_iter": halo_bytes,
        "total_ici_bytes_per_iter": a2a_bytes + gather_bytes + halo_bytes,
        "vs_full_width_a2a_bytes": full_width_a2a,
    }


_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4,
                "u32": 4, "s16": 2, "u16": 2, "c64": 8, "c128": 16,
                "pred": 1, "s8": 1, "u8": 1}

_SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|c64|c128|s32|u32|s16|u16|s8|u8|"
                       r"pred)\[([0-9,]*)\]")


def _shape_bytes(m) -> int:
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dt]


def hlo_collective_bytes_per_iter(mesh: Mesh, ph: int, pw: int,
                                  nplanes: int = 1, batch: int = 1,
                                  n_iter: int = 50) -> dict:
    """Audit the ICI model against the COMPILED program: lower + compile
    the rpallas shard_map'd loop and parse the per-iteration collective
    bytes out of the HLO (the loop body appears once in the while loop,
    so module-wide op counts ARE per-iteration counts; ``n_iter`` is set
    large enough that XLA never unrolls the loop).

    Byte conventions match :func:`ici_traffic_model` (per-device
    off-chip bytes): all-to-all counts (n-1)/n of the participating
    local bytes, all-gather counts the received (n-1)/n of its full
    output, collective-permute counts its full payload."""
    from ..ops import pallas_kernels2 as pk2
    from ..recon.admm import ADMMParams

    n = mesh.shape[AXIS]
    mh = pw // 2
    run = _build_rpallas_run(mesh, ph, pw, ADMMParams(), n_iter=n_iter)
    st = jax.ShapeDtypeStruct
    shapes = (
        st((nplanes, ph, mh), np.float32),
        st((nplanes, ph, mh), np.float32),
        st((nplanes, ph, mh), np.float32),
        st((nplanes, ph, pw), np.float32),
        st((batch, nplanes, ph, pw), np.float32),
    ) + (st((nplanes, ph), np.float32),) * 6
    interpret = jax.devices()[0].platform != "tpu"
    with pk2.forced_interpret(interpret):
        txt = jax.jit(run).lower(*shapes).compile().as_text()

    frac = (n - 1) / n
    a2a = gather = permute = 0.0
    counts = {"all-to-all": 0, "all-gather": 0, "collective-permute": 0}
    for line in txt.splitlines():
        s = line.strip()
        if "=" not in s:
            continue
        lhs, _, rhs = s.partition("=")
        op = rhs.strip()
        if op.startswith("(") and ") all-to-all(" in op:
            # tuple form: result tuple elements are the per-participant
            # chunks; their sum is the local participating bytes
            tuple_part = op[:op.index(") all-to-all(") + 1]
            a2a += sum(_shape_bytes(m)
                       for m in _SHAPE_RE.finditer(tuple_part)) * frac
            counts["all-to-all"] += 1
        elif " all-to-all(" in op or op.startswith("all-to-all("):
            m = _SHAPE_RE.search(op)  # result shape leads the op text
            if m:
                a2a += _shape_bytes(m) * frac
                counts["all-to-all"] += 1
        elif " all-gather(" in op or op.startswith("all-gather("):
            m = _SHAPE_RE.search(op)
            if m:
                gather += _shape_bytes(m) * frac
                counts["all-gather"] += 1
        elif " collective-permute(" in op or op.startswith("collective-permute("):
            m = _SHAPE_RE.search(op)
            if m:
                permute += _shape_bytes(m)
                counts["collective-permute"] += 1
    return {
        "a2a_bytes_per_iter": a2a,
        "gather_bytes_per_iter": gather,
        "halo_bytes_per_iter": permute,
        "total_ici_bytes_per_iter": a2a + gather + permute,
        "op_counts": counts,
    }


def _build_rpallas_run(mesh: Mesh, ph: int, pw: int, params: ADMMParams,
                       n_iter: int):
    """The jitted shard_map'd half-spectrum pencil ADMM loop; factored
    out so the multi-chip dryrun can abstractly evaluate it at the
    12 MP-padded grid shape (jax.eval_shape) without host-side
    spectra."""
    from ..ops import pallas_kernels2 as pk2

    mu1, mu2, mu3, tau = params.mu1, params.mu2, params.mu3, params.tau
    mh = pw // 2

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, None, AXIS), P(None, None, AXIS),
                  P(None, None, AXIS), P(None, AXIS), P(None, None, AXIS),
                  P(), P(), P(), P(), P(), P()),
        out_specs=P(None, None, AXIS),
        check_vma=False,
    )
    def run(Hr_l, Hi_l, R_l, Xdiv_l, data_l,
            H0r, H0i, HMr, HMi, R0, RM):
        f32 = jnp.float32
        nplanes = data_l.shape[1]
        rows = data_l.shape[2]
        H0 = jax.lax.complex(H0r, H0i)
        HM = jax.lax.complex(HMr, HMi)

        vm_rw = jax.vmap(jax.vmap(pk2.rfft_w))
        vm_hcd = jax.vmap(jax.vmap(
            lambda a, b, c, d, hr, hi, rr: pk2.fft_h_combine_dual(
                a, b, c, d, hr, hi, rr, ph)),
            in_axes=(0, 0, 0, 0, None, None, None))
        vm_iwd = jax.vmap(jax.vmap(pk2.irfft_w_dual))

        def a2a_fwd(x):   # (B, S, rows, mh) -> (B, S, Ph, cols)
            return jax.lax.all_to_all(x, AXIS, split_axis=3, concat_axis=2,
                                      tiled=True)

        def a2a_inv(x):
            return jax.lax.all_to_all(x, AXIS, split_axis=2, concat_axis=3,
                                      tiled=True)

        def roll_rows(x, up):
            if up:
                first = _ppermute_shift(x[..., :1, :], forward=False)
                return jnp.concatenate([x[..., 1:, :], first], axis=-2)
            last = _ppermute_shift(x[..., -1:, :], forward=True)
            return jnp.concatenate([last, x[..., :-1, :]], axis=-2)

        def dc_patch(col_rk_r, col_rk_i, col_v_r, col_v_i):
            """Exact DC/Nyquist packed-lane columns: (B, P, rows_local)
            slices are all_gathered to full (Ph,) columns (tiny), the
            four length-Ph FFP chains run replicated, and each shard
            keeps its own row block."""
            gat = lambda c: jax.lax.all_gather(
                c.astype(f32), AXIS, axis=2, tiled=True)
            cols = jnp.stack([gat(col_rk_r), gat(col_rk_i),
                              gat(col_v_r), gat(col_v_i)])  # (4, B, P, Ph)
            A0, AM, B0, BM = jnp.fft.fft(cols, axis=-1)
            F0 = R0 * (A0 + jnp.conj(H0) * B0)
            FM = RM * (AM + jnp.conj(HM) * BM)
            outs = jnp.fft.ifft(jnp.stack([F0, FM, H0 * F0, HM * FM]),
                                axis=-1).real
            outs = jax.lax.dynamic_slice_in_dim(
                outs, _my_idx() * rows, rows, axis=-1)
            zc = jnp.zeros(outs.shape[1:3] + (rows, 128), f32)
            return tuple(zc.at[..., 0].set(outs[k]) for k in range(4))

        zeros = data_l * 0.0
        state = dict(image=zeros, forward_out=zeros, v=zeros, b=zeros,
                     a0=zeros, a1=zeros)

        def body(_, s):
            # --- local carry-rebuild elementwise block (split layout) ---
            psi0 = roll_rows(s["image"], up=False) - s["image"]
            psi1 = _split_roll_p1_last(s["image"], mh) - s["image"]
            eta0_eff = mu2 * psi0 - s["a0"]
            eta1_eff = mu2 * psi1 - s["a1"]
            U0 = soft_thresh(psi0 + eta0_eff / mu2, tau / mu2)
            U1 = soft_thresh(psi1 + eta1_eff / mu2, tau / mu2)
            a0 = mu2 * U0 - eta0_eff
            a1 = mu2 * U1 - eta1_eff
            xi = mu1 * s["forward_out"] - s["v"]
            X = Xdiv_l * (xi + mu1 * s["forward_out"] + data_l)
            v = mu1 * X - xi
            rho = mu3 * s["image"] - s["b"]
            W = jnp.maximum(rho / mu3 + s["image"], 0.0)
            b = mu3 * W - rho
            rk = (b
                  + (roll_rows(a0, up=True) - a0)
                  + (_split_roll_m1_last(a1, mh) - a1))

            # --- packed-real W forward of rk and v, ONE vmapped kernel
            # call (planes stacked) and ONE stacked forward a2a ---
            zr, zi = vm_rw(jnp.concatenate([rk, v], axis=1))
            p0, p1, pf_, pm = dc_patch(zr[..., 0][:, :nplanes],
                                       zi[..., 0][:, :nplanes],
                                       zr[..., 0][:, nplanes:],
                                       zi[..., 0][:, nplanes:])
            big = a2a_fwd(jnp.concatenate([zr, zi], axis=1))
            rkr, vr = big[:, :nplanes], big[:, nplanes:2 * nplanes]
            rki, vi = (big[:, 2 * nplanes:3 * nplanes],
                       big[:, 3 * nplanes:])

            # --- fused H chain: fwd both + combine + dual inverse ---
            (f0r, f0i), (f1r, f1i) = vm_hcd(rkr, rki, vr, vi,
                                            Hr_l, Hi_l, R_l)
            big2 = a2a_inv(jnp.concatenate([f0r, f1r, f0i, f1i], axis=1))

            # --- dual packed-real W inverse with the DC patch ---
            image, forward_out = vm_iwd(
                big2[:, :nplanes], big2[:, 2 * nplanes:3 * nplanes],
                big2[:, nplanes:2 * nplanes], big2[:, 3 * nplanes:],
                p0, p1, pf_, pm)
            return dict(image=image.astype(f32),
                        forward_out=forward_out.astype(f32),
                        v=v, b=b, a0=a0, a1=a1)

        state = jax.lax.fori_loop(0, n_iter, body, state)
        return jnp.maximum(state["image"], 0.0)

    return run
