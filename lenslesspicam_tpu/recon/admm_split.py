"""ADMM with the split-order matmul-FFT backend (ops/pallas_fft.py).

Same algebra as recon/admm.py's 4-FFT step, but every transform runs
through the two-stage MXU matmul pipeline and all spectra (H, conj(H),
R_divmat) live in the digit-split frequency order — no reorder
transposes anywhere in the loop.  Built for the single-image case (the
12 MP headline benchmark); the general batched solver remains
recon/admm.py.

Numerics: identical to admm.run up to f32 matmul accumulation error
(verified ~1e-5 relative in tests/test_pallas_fft.py).
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import pallas_fft as pf
from ..ops.padding import padded_size
from ..ops.tv import soft_thresh
from .admm import ADMMParams


class SplitPrecomp(NamedTuple):
    Hr: jax.Array
    Hi: jax.Array
    R: jax.Array        # real, split order
    X_divmat: jax.Array  # spatial (Ph, Pw)
    data_pad: jax.Array  # spatial (Ph, Pw)
    psf_shape: tuple
    padded_shape: tuple
    start: tuple


def precompute_split(psf2d: np.ndarray, data2d: np.ndarray,
                     params: ADMMParams = ADMMParams()) -> SplitPrecomp:
    """Spectra in split order for a (H, W) grayscale PSF/measurement."""
    nh, nw = psf2d.shape
    ph, pw = padded_size(nh), padded_size(nw)
    assert ph % 2 == 0 and pw % 2 == 0
    sy, sx = (ph - nh) // 2, (pw - nw) // 2

    pad = np.zeros((ph, pw), np.float32)
    pad[sy : sy + nh, sx : sx + nw] = psf2d
    H_nat = np.fft.fft2(pad).astype(np.complex64)
    # fold the ifftshift into the spectrum (even sizes): (-1)^(ky+kx)
    mask = np.outer((-1.0) ** np.arange(ph), (-1.0) ** np.arange(pw)).astype(np.float32)
    H_nat = H_nat * mask

    # TV gram spectrum (ops/tv.py): |fft2(4-point laplacian)|
    kern = np.zeros((ph, pw), np.float32)
    kern[0, 0] = 4.0
    kern[0, 1] = kern[0, -1] = kern[1, 0] = kern[-1, 0] = -1.0
    psi = np.abs(np.fft.fft2(kern))

    R_nat = 1.0 / (params.mu1 * np.abs(H_nat) ** 2 + params.mu2 * psi + params.mu3)

    H_split = pf.spectrum_to_split(H_nat, axes=(0, 1))
    R_split = pf.spectrum_to_split(R_nat.astype(np.float32), axes=(0, 1))

    ones_pad = np.zeros((ph, pw), np.float32)
    ones_pad[sy : sy + nh, sx : sx + nw] = 1.0
    X_divmat = (1.0 / (ones_pad + params.mu1)).astype(np.float32)

    data_pad = np.zeros((ph, pw), np.float32)
    data_pad[sy : sy + nh, sx : sx + nw] = data2d

    return SplitPrecomp(
        Hr=jnp.asarray(np.ascontiguousarray(H_split.real)),
        Hi=jnp.asarray(np.ascontiguousarray(H_split.imag)),
        R=jnp.asarray(R_split),
        X_divmat=jnp.asarray(X_divmat),
        data_pad=jnp.asarray(data_pad),
        psf_shape=(nh, nw),
        padded_shape=(ph, pw),
        start=(sy, sx),
    )


def _roll1(x, shift, axis):
    """roll by ±1 as concat-of-slices (equivalent to jnp.roll; lowers to
    contiguous copies rather than a gather — measured neutral inside the
    fused loop, kept for lowering predictability)."""
    if axis == 0:
        parts = ([x[-1:], x[:-1]] if shift == 1 else [x[1:], x[:1]])
    else:
        parts = ([x[:, -1:], x[:, :-1]] if shift == 1 else [x[:, 1:], x[:, :1]])
    return jnp.concatenate(parts, axis=axis)


def _finite_diff(x):
    return _roll1(x, 1, 0) - x, _roll1(x, 1, 1) - x


def _finite_diff_adj(u0, u1):
    return (_roll1(u0, -1, 0) - u0) + (_roll1(u1, -1, 1) - u1)


def _fft_fns(backend: str, ph: int):
    """(fwd2, inv2, inv2_dual, fwd2_combine) full 2-D split-order
    transform pairs; fwd2_combine (pallas only, else None) runs the
    second forward with the ADMM spectrum combine fused into its
    stage-2 kernel."""
    if backend == "pallas":
        from ..ops import pallas_kernels2 as pk2

        def fwd2(x):
            wr, wi = pk2.fft_w(x)
            return pk2.fft_h(wr, wi, ph)

        def inv2(vr, vi):
            br, bi = pk2.ifft_h(vr, vi, ph)
            return pk2.ifft_w(br, bi)

        def inv2_dual(vr, vi, hr, hi):
            (a0r, a0i), (a1r, a1i) = pk2.ifft_h_dual(vr, vi, hr, hi, ph)
            # image / forward_out ride the carry at the IO width too —
            # they are recomputed every iteration (no accumulation), so
            # bf16 storage only adds per-iteration rounding
            return (pk2.ifft_w(a0r, a0i, out_dtype=pk2._IO_DTYPE),
                    pk2.ifft_w(a1r, a1i, out_dtype=pk2._IO_DTYPE))

        def fwd2_combine(v, ar, ai, hr, hi, rr):
            wr, wi = pk2.fft_w(v)
            return pk2.fft_h_combine(wr, wi, ar, ai, hr, hi, rr, ph)

        return fwd2, inv2, inv2_dual, fwd2_combine

    def fwd2(x):
        return pf.fft_h_split(*pf.fft_w_split(x))

    def inv2(vr, vi):
        return pf.ifft_w_split(*pf.ifft_h_split(vr, vi))

    def inv2_dual(vr, vi, hr, hi):
        img = inv2(vr, vi)
        fwd = inv2(vr * hr - vi * hi, vr * hi + vi * hr)
        return img, fwd

    return fwd2, inv2, inv2_dual, None


def run_split_fused(pre: SplitPrecomp, params: ADMMParams = ADMMParams(),
                    n_iter: int = 100) -> jax.Array:
    """Fully-fused grayscale ADMM with the carry-rebuild state scheme:
    the per-iteration elementwise updates ride inside the W-axis Pallas
    kernels (pallas_kernels2.e1_carry), and the accumulating duals are
    never stored — xi/rho/eta are rebuilt in-kernel from the carried
    {v, b, a0, a1} planes via one algebraic identity each (exactly
    equivalent; see _e1c_kernel).  The post-transform step collapses to
    a pure dual W-inverse.  Reference update ordering:
    lensless/recon/admm.py."""
    from ..ops import pallas_kernels2 as pk2

    mu1, mu2, mu3, tau = params.mu1, params.mu2, params.mu3, params.tau
    ph, pw = pre.padded_shape
    io = pk2._IO_DTYPE
    Hr_c, Hi_c, R_c = (jnp.asarray(pre.Hr, io), jnp.asarray(pre.Hi, io),
                       jnp.asarray(pre.R, io))
    # static planes at the io dtype: X_divmat's two values are rebuilt
    # in-kernel from the {0,1} support mask (exact even in bf16); the
    # padded data loses ~8 mantissa bits under bf16 — covered by the
    # bench quality gate
    mask_c = jnp.asarray(pre.X_divmat * mu1 < 0.5, io)
    dp_c = jnp.asarray(pre.data_pad, io)
    zeros_cr = jnp.zeros((ph, pw), pk2._CARRY_DTYPE)
    zeros_v = jnp.zeros((ph, pw), pk2._CARRY_V_DTYPE)
    zeros_io = jnp.zeros((ph, pw), io)
    state = dict(image=zeros_io, fwd=zeros_io, v=zeros_v, b=zeros_cr,
                 a0=zeros_cr, a1=zeros_cr)

    def body(_, s):
        (rkr, rki, vr_, vi_, vn, a0n, a1n, bn) = pk2.e1_carry(
            s["image"], s["fwd"], s["v"], s["b"], s["a0"], s["a1"],
            mask_c, dp_c, mu1, mu2, mu3, tau)
        (a0r, a0i), (a1r, a1i) = pk2.fft_h_combine_dual(
            rkr, rki, vr_, vi_, Hr_c, Hi_c, R_c, ph)
        imgn, fwdn = pk2.ifft_w_dual(a0r, a0i, a1r, a1i)
        return dict(image=imgn, fwd=fwdn, v=vn, b=bn, a0=a0n, a1=a1n)

    state = jax.lax.fori_loop(0, n_iter, body, state)
    sy, sx = pre.start
    nh, nw = pre.psf_shape
    img = state["image"].astype(jnp.float32)
    crop = img[sy : sy + nh, sx : sx + nw]
    return jnp.maximum(crop, 0.0)


# ---------------------------------------------------------------------------
# half-spectrum (rfft-packed) fused path.  Spatial planes ride in the
# even/odd split lane layout; spectra, filter constants, and all H-axis
# kernel work are HALF width (ops/pallas_fft.py rfft section).  The one
# packed DC lane (Z[0] + i Z[M]) is recomputed exactly in XLA each
# iteration (two spatial columns, negligible) and patched in before the
# inverse — everything else is bit-equivalent to the full-width path.
# ---------------------------------------------------------------------------


class RSplitPrecomp(NamedTuple):
    Hr: jax.Array        # (Ph, Pw/2) half-spectrum planes, split order
    Hi: jax.Array
    R: jax.Array
    mask: jax.Array      # (Ph, Pw) {0,1} support mask, split lane layout
    data_pad: jax.Array
    # (Ph,) filter columns at kw = 0 / M, r/i separated (complex64
    # host->device transfer is unimplemented on the axon tunnel)
    H0r: jax.Array
    H0i: jax.Array
    HMr: jax.Array
    HMi: jax.Array
    R0: jax.Array        # (Ph,) f32
    RM: jax.Array
    psf_shape: tuple
    padded_shape: tuple
    start: tuple


def precompute_rsplit(psf2d: np.ndarray, data2d: np.ndarray,
                      params: ADMMParams = ADMMParams()) -> RSplitPrecomp:
    """Half-spectrum split precompute for a (H, W) grayscale
    PSF/measurement (same spectra as precompute_split, stored at half
    width + the DC/Nyquist patch columns)."""
    nh, nw = psf2d.shape
    ph, pw = padded_size(nh), padded_size(nw)
    assert ph % 2 == 0 and pw % 2 == 0
    sy, sx = (ph - nh) // 2, (pw - nw) // 2
    mh = pw // 2

    pad = np.zeros((ph, pw), np.float32)
    pad[sy : sy + nh, sx : sx + nw] = psf2d
    H_nat = np.fft.fft2(pad).astype(np.complex64)
    mask = np.outer((-1.0) ** np.arange(ph), (-1.0) ** np.arange(pw)).astype(np.float32)
    H_nat = H_nat * mask

    kern = np.zeros((ph, pw), np.float32)
    kern[0, 0] = 4.0
    kern[0, 1] = kern[0, -1] = kern[1, 0] = kern[-1, 0] = -1.0
    psi = np.abs(np.fft.fft2(kern))
    R_nat = 1.0 / (params.mu1 * np.abs(H_nat) ** 2 + params.mu2 * psi + params.mu3)
    R_nat = R_nat.astype(np.float32)

    H_half = pf.spectrum_to_half_split(H_nat)
    R_half = pf.spectrum_to_half_split(R_nat)

    def to_split(x):
        return np.ascontiguousarray(
            np.concatenate([x[:, 0::2], x[:, 1::2]], axis=1))

    ones_pad = np.zeros((ph, pw), np.float32)
    ones_pad[sy : sy + nh, sx : sx + nw] = 1.0
    data_pad = np.zeros((ph, pw), np.float32)
    data_pad[sy : sy + nh, sx : sx + nw] = data2d

    return RSplitPrecomp(
        Hr=jnp.asarray(np.ascontiguousarray(H_half.real)),
        Hi=jnp.asarray(np.ascontiguousarray(H_half.imag)),
        R=jnp.asarray(np.ascontiguousarray(R_half)),
        mask=jnp.asarray(to_split(ones_pad)),
        data_pad=jnp.asarray(to_split(data_pad)),
        H0r=jnp.asarray(np.ascontiguousarray(H_nat[:, 0].real)),
        H0i=jnp.asarray(np.ascontiguousarray(H_nat[:, 0].imag)),
        HMr=jnp.asarray(np.ascontiguousarray(H_nat[:, mh].real)),
        HMi=jnp.asarray(np.ascontiguousarray(H_nat[:, mh].imag)),
        R0=jnp.asarray(R_nat[:, 0]),
        RM=jnp.asarray(R_nat[:, mh]),
        psf_shape=(nh, nw),
        padded_shape=(ph, pw),
        start=(sy, sx),
    )


def run_split_rfused(pre: RSplitPrecomp, params: ADMMParams = ADMMParams(),
                     n_iter: int = 100, return_sat: bool = False):
    """Fully-fused grayscale ADMM on the half-spectrum backend.  Same
    state algebra as run_split (reference ordering
    lensless/recon/admm.py); HBM traffic of every spectrum pass halves.

    return_sat: also return the carry-saturation scalar — the running
    max of |carry| / full-scale over ALL iterations and all quantized
    carry planes ({v} and {a0, a1, b}).  >= 1.0 means an int16 carry
    clipped and the result cannot be trusted; bench.py asserts < 1 on
    every quality-gated run (the scales are parameter-derived bounds,
    not guarantees — this channel turns a silent clip into a detected
    failure).

    Two kernel placements (LPT_RFUSED_V3, default on):

    * v3: the X/v data-fidelity chain rides inside the dual W-inverse
      kernel (the forward estimate never crosses HBM) and the TV
      kernel's image/a0 halos arrive as skinny block-boundary-row
      tensors — ~0.5 GB/iter less traffic at 12MP than v2.
    * v2 (fallback): e1_rcarry carries fwd through HBM and re-fetches
      whole neighbour blocks for the halos.
    """
    from ..ops import pallas_kernels2 as pk2

    mu1, mu2, mu3, tau = params.mu1, params.mu2, params.mu3, params.tau
    ph, pw = pre.padded_shape
    io = pk2._IO_DTYPE
    f32 = jnp.float32
    Hr_c, Hi_c, R_c = (jnp.asarray(pre.Hr, io), jnp.asarray(pre.Hi, io),
                       jnp.asarray(pre.R, io))
    # static planes ride at the inter-kernel storage dtype: the support
    # mask is {0,1} (exact in bf16); the padded data plane loses ~8
    # mantissa bits under bf16 io — covered by the bench PSNR gate
    mask_c = jnp.asarray(pre.mask, io)
    dp_c = jnp.asarray(pre.data_pad, io)
    zeros_v = jnp.zeros((ph, pw), pk2._CARRY_V_DTYPE)
    zeros_tv = jnp.zeros((ph, pw), pk2._CARRY_TV_DTYPE)
    zeros_io = jnp.zeros((ph, pw), io)
    H0 = jax.lax.complex(pre.H0r, pre.H0i)
    HM = jax.lax.complex(pre.HMr, pre.HMi)
    zcol = jnp.zeros((ph, 128), f32)
    needs_interp = not pk2.rfused_mosaic_ok(ph, pw)

    skip_dc = os.environ.get("LPT_SKIP_DCPATCH", "") == "1"  # timing probes ONLY
    use_v3 = os.environ.get("LPT_RFUSED_V3", "1") != "0"

    def dc_patch(rkr, rki, vr_, vi_):
        # exact DC (kw=0) and Nyquist (kw=M) columns on the side: the
        # packed lane is not separable under the filter multiply, so the
        # two real spatial columns are convolved directly in XLA
        if skip_dc:
            z = jnp.zeros((ph,), f32)
            return z, z, z, z
        # one batched length-ph FFT for the four analysis columns and one
        # for the four synthesis columns (XLA runs a single batched fft
        # op instead of eight serialized ones)
        cols = jnp.stack([rkr[:, 0], rki[:, 0], vr_[:, 0], vi_[:, 0]])
        A0, AM, B0, BM = jnp.fft.fft(cols.astype(f32), axis=-1)
        F0 = pre.R0 * (A0 + jnp.conj(H0) * B0)
        FM = pre.RM * (AM + jnp.conj(HM) * BM)
        outs = jnp.fft.ifft(jnp.stack([F0, FM, H0 * F0, HM * FM]),
                            axis=-1).real
        return outs[0], outs[1], outs[2], outs[3]

    if use_v3:
        # iteration-0 v carry: with all other state zero the first X
        # update gives v = mu1 * X_divmat * data (see _e1cr_kernel
        # algebra) — precompute it and its W spectrum outside the loop
        c_in, c_out = 1.0 / (1.0 + mu1), 1.0 / mu1
        xdv = c_out + (c_in - c_out) * jnp.asarray(pre.mask, f32)
        v_init = (mu1 * xdv * jnp.asarray(pre.data_pad, f32))
        with pk2.forced_interpret(needs_interp):
            vwr0, vwi0 = pk2.rfft_w(v_init.astype(io))
        state = dict(image=zeros_io, a0=zeros_tv, a1=zeros_tv, b=zeros_tv,
                     v=pk2.encode_v(v_init, mu1),
                     vwr=vwr0, vwi=vwi0, sat=jnp.zeros((), f32))

        # the v saturation check reads the STORED int16 plane with a
        # dedicated tiny scan kernel every LPT_SAT_EVERY-th iteration
        # (default 8; ~0.015 ms/iter amortized) — full spatial
        # coverage, and the hot dual-state kernel stays variant-free
        # at its best block (in-kernel sat variants under lax.cond or
        # nested loops inflate scoped VMEM by 0.4-0.9 MB and OOM the
        # 32-row block).  The dual moves O(mu1) per step, so any
        # quality-relevant (persistent) clip spans many iterations and
        # is caught; sat_every=1 scans every iteration.
        sat_every = max(int(os.environ.get("LPT_SAT_EVERY", "8")), 1)
        scan_v = (pk2._CARRY_V_DTYPE == jnp.int16
                  and getattr(pk2, "_SAT_ENABLED", True))

        def body(i, s):
            (rkr, rki, a0n, a1n, bn, sat_tv) = pk2.e1_rtv(
                s["image"], s["a0"], s["a1"], s["b"], mu2, mu3, tau)
            i0, iM, f0, fM = dc_patch(rkr, rki, s["vwr"], s["vwi"])
            (a0r, a0i), (a1r, a1i) = pk2.fft_h_combine_dual(
                rkr, rki, s["vwr"], s["vwi"], Hr_c, Hi_c, R_c, ph)
            (imgn, vn, vwrn, vwin, _zero) = pk2.irfft_w_dual_state(
                a0r, a0i, a1r, a1i,
                zcol.at[:, 0].set(i0), zcol.at[:, 0].set(iM),
                zcol.at[:, 0].set(f0), zcol.at[:, 0].set(fM),
                s["v"], mask_c, dp_c, mu1, with_sat=False)
            sat = jnp.maximum(s["sat"], jnp.max(sat_tv))
            if scan_v:
                sat_v = jax.lax.cond(
                    i % sat_every == 0,
                    lambda v: jnp.max(pk2.sat_scan_i16(v)),
                    lambda v: jnp.zeros((), f32), vn)
                sat = jnp.maximum(sat, sat_v)
            return dict(image=imgn, a0=a0n, a1=a1n, b=bn,
                        v=vn, vwr=vwrn, vwi=vwin, sat=sat)
    else:
        state = dict(image=zeros_io, fwd=zeros_io, v=zeros_v, b=zeros_tv,
                     a0=zeros_tv, a1=zeros_tv, sat=jnp.zeros((), f32))
        sc_a, sc_b = pk2._tv_scales(mu2, mu3, tau)

        def body(_, s):
            (rkr, rki, vr_, vi_, vn, a0n, a1n, bn) = pk2.e1_rcarry(
                s["image"], s["fwd"], s["v"], s["b"], s["a0"], s["a1"],
                mask_c, dp_c, mu1, mu2, mu3, tau)
            i0, iM, f0, fM = dc_patch(rkr, rki, vr_, vi_)
            (a0r, a0i), (a1r, a1i) = pk2.fft_h_combine_dual(
                rkr, rki, vr_, vi_, Hr_c, Hi_c, R_c, ph)
            imgn, fwdn = pk2.irfft_w_dual(
                a0r, a0i, a1r, a1i,
                zcol.at[:, 0].set(i0), zcol.at[:, 0].set(iM),
                zcol.at[:, 0].set(f0), zcol.at[:, 0].set(fM))
            # v2 has no in-kernel channel; the STORED carries bound the
            # fraction at 1.0 (post-clip) — still a detection
            sat = s["sat"]
            for plane, sc in ((vn, pk2._v_scale(mu1)), (a0n, sc_a),
                              (a1n, sc_a), (bn, sc_b)):
                if plane.dtype == jnp.int16:
                    sat = jnp.maximum(sat, pk2.carry_sat_fraction(plane, sc))
            return dict(image=imgn, fwd=fwdn, v=vn, b=bn, a0=a0n, a1=a1n,
                        sat=sat)

    with pk2.forced_interpret(needs_interp):
        state = jax.lax.fori_loop(0, n_iter, body, state)
    img = pf.from_split_layout(state["image"].astype(f32))
    sy, sx = pre.start
    nh, nw = pre.psf_shape
    out = jnp.maximum(img[sy : sy + nh, sx : sx + nw], 0.0)
    if return_sat:
        return out, state["sat"]
    return out


@partial(jax.jit, static_argnames=("psf_shape", "padded_shape", "start",
                                   "params", "return_sat"))
def _run_rsplit_jit(Hr, Hi, R, mask, data_pad, H0r, H0i, HMr, HMi,
                    R0, RM, psf_shape, padded_shape, start, params, n_iter,
                    return_sat=False):
    pre = RSplitPrecomp(Hr, Hi, R, mask, data_pad, H0r, H0i, HMr, HMi,
                        R0, RM, psf_shape, padded_shape, start)
    return run_split_rfused(pre, params, n_iter, return_sat=return_sat)


def run_rsplit_jit(pre: RSplitPrecomp, params: ADMMParams = ADMMParams(),
                   n_iter=100, return_sat=False):
    """jit entry for the half-spectrum fused backend."""
    return _run_rsplit_jit(pre.Hr, pre.Hi, pre.R, pre.mask, pre.data_pad,
                           pre.H0r, pre.H0i, pre.HMr, pre.HMi, pre.R0, pre.RM,
                           pre.psf_shape, pre.padded_shape, pre.start, params,
                           jnp.asarray(n_iter), return_sat)


def _to_split_jax(x2d):
    """Even/odd split lane layout, traced (matches pallas_fft
    to_split_layout / the numpy to_split in precompute_rsplit)."""
    return jnp.concatenate([x2d[:, 0::2], x2d[:, 1::2]], axis=1)


def precompute_rsplit_general(psf, data, params: ADMMParams = ADMMParams()):
    """Per-plane half-spectrum precompute for (D, H, W, C) PSFs and
    (B, D, H, W, C) measurements (the rfused analog of
    precompute_split_general): plane-stacked RSplitPrecomp arrays."""
    psf = np.asarray(psf, np.float32)
    data = np.asarray(data, np.float32)
    if data.ndim == 3:
        data = data[None, None]
    elif data.ndim == 4:
        data = data[None]
    depth, nh, nw, ch = psf.shape
    batch = data.shape[0]

    pres = []
    for d in range(depth):
        for c in range(ch):
            d_idx = min(d, data.shape[1] - 1)
            pres.append(precompute_rsplit(psf[d, :, :, c],
                                          data[0, d_idx, :, :, c], params))
    stacked = RSplitPrecomp(
        *[jnp.stack([getattr(p, f) for p in pres])
          for f in ("Hr", "Hi", "R", "mask", "data_pad",
                    "H0r", "H0i", "HMr", "HMi", "R0", "RM")],
        psf_shape=pres[0].psf_shape,
        padded_shape=pres[0].padded_shape,
        start=pres[0].start,
    )
    info = dict(batch=batch, depth=depth, channels=ch)
    return stacked, info


def run_rsplit_general(pre_planes: RSplitPrecomp, info: dict, data,
                       params: ADMMParams = ADMMParams(),
                       n_iter: int = 100, return_sat: bool = False):
    """Batched RGB/3-D ADMM on the half-spectrum fused backend;
    returns (B, D, H, W, C).

    The per-plane solver is vmapped over a flat (B * D * C) plane axis —
    under vmap every Pallas call gains a leading grid dimension, so the
    whole batch runs as ONE fused kernel pipeline per pass (no Python
    loop over planes; the reference's batched eval loops per sample,
    lensless/eval/benchmark.py:169)."""
    data = jnp.asarray(data, jnp.float32)
    if data.ndim == 3:
        data = data[None, None]
    elif data.ndim == 4:
        data = data[None]
    batch, depth, ch = info["batch"], info["depth"], info["channels"]
    if data.shape[1] == 1 and depth > 1:
        data = jnp.broadcast_to(data, (data.shape[0], depth) + data.shape[2:])
    planes = data.transpose(0, 1, 4, 2, 3).reshape(batch, depth * ch,
                                                   *data.shape[2:4])

    def one_plane(consts, plane2d):
        (Hr, Hi, R, mask, H0r, H0i, HMr, HMi, R0, RM) = consts
        pre = RSplitPrecomp(Hr, Hi, R, mask,
                            _to_split_jax(_pad_plane(plane2d, pre_planes)),
                            H0r, H0i, HMr, HMi, R0, RM,
                            pre_planes.psf_shape, pre_planes.padded_shape,
                            pre_planes.start)
        return run_split_rfused(pre, params, n_iter, return_sat=return_sat)

    consts = (pre_planes.Hr, pre_planes.Hi, pre_planes.R,
              pre_planes.mask, pre_planes.H0r, pre_planes.H0i,
              pre_planes.HMr, pre_planes.HMi, pre_planes.R0, pre_planes.RM)
    # inner vmap over planes (constants batched), outer over batch
    # (constants broadcast — no HBM duplication of the spectra)
    per_plane = jax.vmap(one_plane, in_axes=(0, 0))
    out = jax.vmap(lambda pb: per_plane(consts, pb))(planes)  # (B, P, H, W)
    if return_sat:
        out, sats = out
        sat = jnp.max(sats)
    nh, nw = pre_planes.psf_shape
    out = out.reshape(batch, depth, ch, nh, nw).transpose(0, 1, 3, 4, 2)
    return (out, sat) if return_sat else out


def run_split(pre: SplitPrecomp, params: ADMMParams = ADMMParams(),
              n_iter: int = 100, backend: str = "jax") -> jax.Array:
    """Grayscale single-image ADMM on the split-FFT backend; returns the
    cropped (H, W) reconstruction.  backend: "jax" | "pallas" | "fused"."""
    if backend == "fused":
        return run_split_fused(pre, params, n_iter)
    mu1, mu2, mu3, tau = params.mu1, params.mu2, params.mu3, params.tau
    ph, pw = pre.padded_shape
    fwd2, inv2, inv2_dual, fwd2_combine = _fft_fns(backend, ph)
    # inter-kernel storage dtype of the pallas backend (LPT_SPLIT_IO);
    # spectra and filter constants ride HBM at this width, arithmetic
    # stays f32 (upcast where it matters)
    io = jnp.float32
    if backend == "pallas":
        from ..ops import pallas_kernels2 as _pk2
        io = _pk2._IO_DTYPE
    Hr_c, Hi_c, R_c = (jnp.asarray(pre.Hr, io), jnp.asarray(pre.Hi, io),
                       jnp.asarray(pre.R, io))
    zeros = jnp.zeros((ph, pw), jnp.float32)
    zeros_io = jnp.zeros((ph, pw), io)
    # X / W / U are recomputed each iteration from the carried duals and
    # image — keeping only what the next iteration actually reads saves
    # 4 full-plane HBM writes per iteration (~0.8 GB at 12MP).  The
    # accumulating duals stay f32; the per-iteration planes (image,
    # forward_out, psi) ride the carry at the IO width.
    state = dict(
        image=zeros_io, xi=zeros, rho=zeros,
        eta0=zeros, eta1=zeros,
        forward_out=zeros_io, psi0=zeros_io, psi1=zeros_io,
    )

    def body(_, s):
        U0 = soft_thresh(s["psi0"] + s["eta0"] / mu2, tau / mu2)
        U1 = soft_thresh(s["psi1"] + s["eta1"] / mu2, tau / mu2)
        X = pre.X_divmat * (s["xi"] + mu1 * s["forward_out"] + pre.data_pad)
        W = jnp.maximum(s["rho"] / mu3 + s["image"], 0.0)

        rk_spatial = (mu3 * W - s["rho"]) + _finite_diff_adj(
            mu2 * U0 - s["eta0"], mu2 * U1 - s["eta1"]
        )
        v = mu1 * X - s["xi"]

        # forward transforms (split order)
        ar, ai = fwd2(rk_spatial.astype(io))
        if fwd2_combine is not None:
            # second forward with F_img = R * (A + conj(H) B) fused into
            # its stage-2 kernel (no separate combine pass over HBM)
            fr, fi = fwd2_combine(v.astype(io), ar, ai, Hr_c, Hi_c, R_c)
        else:
            br, bi = fwd2(v.astype(io))
            f32 = jnp.float32
            ar_, ai_, br_, bi_ = (t.astype(f32) for t in (ar, ai, br, bi))
            Hr_, Hi_, R_ = (t.astype(f32) for t in (Hr_c, Hi_c, R_c))
            fr = (R_ * (ar_ + Hr_ * br_ + Hi_ * bi_)).astype(io)
            fi = (R_ * (ai_ + Hr_ * bi_ - Hi_ * br_)).astype(io)
        # image = ifft(F_img); forward_out = ifft(H * F_img) — one
        # fused dual inverse (spectrum read once, H-multiply in-kernel)
        image, forward_out = inv2_dual(fr, fi, Hr_c, Hi_c)

        psi0, psi1 = _finite_diff(image)
        return dict(
            image=image,
            xi=s["xi"] + mu1 * (forward_out - X),
            rho=s["rho"] + mu3 * (image - W),
            eta0=s["eta0"] + mu2 * (psi0 - U0),
            eta1=s["eta1"] + mu2 * (psi1 - U1),
            forward_out=forward_out, psi0=psi0, psi1=psi1,
        )

    state = jax.lax.fori_loop(0, n_iter, body, state)
    sy, sx = pre.start
    nh, nw = pre.psf_shape
    crop = state["image"][sy : sy + nh, sx : sx + nw].astype(jnp.float32)
    return jnp.maximum(crop, 0.0)


@partial(jax.jit, static_argnames=("psf_shape", "padded_shape", "start",
                                   "params", "backend"))
def _run_split_jit(Hr, Hi, R, X_divmat, data_pad, psf_shape, padded_shape,
                   start, params, n_iter, backend):
    pre = SplitPrecomp(Hr, Hi, R, X_divmat, data_pad, psf_shape,
                       padded_shape, start)
    return run_split(pre, params, n_iter, backend)


def run_split_jit(pre: SplitPrecomp, params: ADMMParams = ADMMParams(),
                  n_iter=100, backend: str = "jax"):
    """jit entry; geometry tuples stay static, n_iter stays dynamic."""
    return _run_split_jit(pre.Hr, pre.Hi, pre.R, pre.X_divmat, pre.data_pad,
                          pre.psf_shape, pre.padded_shape, pre.start,
                          params, jnp.asarray(n_iter), backend)


# ---------------------------------------------------------------------------
# batched / RGB / multi-depth generalization via vmap
# ---------------------------------------------------------------------------


def precompute_split_general(psf, data, params: ADMMParams = ADMMParams()):
    """Per-plane split precompute for (D, H, W, C) PSFs and
    (B, D, H, W, C) measurements: planes = D*C spectra, batch broadcasts.

    Returns (pre_planes, shape_info) where pre_planes stacks the
    per-(d, c) SplitPrecomp arrays on a leading axis.
    """
    psf = np.asarray(psf, np.float32)
    data = np.asarray(data, np.float32)
    if data.ndim == 3:
        data = data[None, None]
    elif data.ndim == 4:
        data = data[None]
    depth, nh, nw, ch = psf.shape
    batch = data.shape[0]

    pres = []
    for d in range(depth):
        for c in range(ch):
            # data may broadcast over depth (3-D semantics) and uses the
            # first batch element only for the spatial pad template; the
            # actual measurement is passed at run time per batch element.
            d_idx = min(d, data.shape[1] - 1)
            pres.append(precompute_split(psf[d, :, :, c],
                                         data[0, d_idx, :, :, c], params))
    stacked = SplitPrecomp(
        Hr=jnp.stack([p.Hr for p in pres]),
        Hi=jnp.stack([p.Hi for p in pres]),
        R=jnp.stack([p.R for p in pres]),
        X_divmat=jnp.stack([p.X_divmat for p in pres]),
        data_pad=jnp.stack([p.data_pad for p in pres]),
        psf_shape=pres[0].psf_shape,
        padded_shape=pres[0].padded_shape,
        start=pres[0].start,
    )
    info = dict(batch=batch, depth=depth, channels=ch)
    return stacked, info


def _pad_plane(x2d, pre):
    ph, pw = pre.padded_shape
    nh, nw = pre.psf_shape
    sy, sx = pre.start
    return jnp.zeros((ph, pw), x2d.dtype).at[sy:sy + nh, sx:sx + nw].set(x2d)


def run_split_general(pre_planes: SplitPrecomp, info: dict, data,
                      params: ADMMParams = ADMMParams(), n_iter: int = 100,
                      backend: str = "jax") -> jax.Array:
    """Batched RGB/3-D split-backend ADMM; returns (B, D, H, W, C)."""
    data = jnp.asarray(data, jnp.float32)
    if data.ndim == 3:
        data = data[None, None]
    elif data.ndim == 4:
        data = data[None]
    batch, depth, ch = info["batch"], info["depth"], info["channels"]
    # planes (B, D*C, H, W): broadcast data depth if PSF has more depths
    if data.shape[1] == 1 and depth > 1:
        data = jnp.broadcast_to(data, (data.shape[0], depth) + data.shape[2:])
    planes = data.transpose(0, 1, 4, 2, 3).reshape(batch, depth * ch,
                                                   *data.shape[2:4])

    def one_plane(pre_arrays, plane2d):
        Hr, Hi, R, Xd, _ = pre_arrays
        pre = SplitPrecomp(Hr, Hi, R, Xd, _pad_plane(plane2d, pre_planes),
                           pre_planes.psf_shape, pre_planes.padded_shape,
                           pre_planes.start)
        return run_split(pre, params, n_iter, backend)

    per_plane = jax.vmap(one_plane, in_axes=((0, 0, 0, 0, 0), 0))
    per_batch = jax.vmap(lambda planes_b: per_plane(
        (pre_planes.Hr, pre_planes.Hi, pre_planes.R, pre_planes.X_divmat,
         pre_planes.data_pad), planes_b))
    out = per_batch(planes)  # (B, D*C, H, W)
    nh, nw = pre_planes.psf_shape
    return out.reshape(batch, depth, ch, nh, nw).transpose(0, 1, 3, 4, 2)
