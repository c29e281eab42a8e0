"""Pallas TPU FFT, pass-structured variant (VMEM-friendly blocks).

The single-kernel H-axis transform of ops/pallas_kernels.py needs the
whole 6144-row column tile in VMEM, which exceeds the 16 MB budget at
the mandatory 128-lane block width.  This variant restructures each
axis transform into thin passes whose blocks are small:

W axis (rows, contiguous):  one kernel per direction — a (BR, W) row
    block is VMEM-resident and the full two-stage transform happens
    in-kernel (as in pallas_kernels.py; blocks already valid).

H axis (columns): two passes over the (n1, n2, W) view of the plane
    (h = j1 * n2 + j2):

    pass A (stage 1 + twiddle):  y[k1, j2, w] = T[k1, j2] *
        sum_j1 F1[k1, j1] x[j1, j2, w]
        grid over (j2, w) tiles; block (n1, 8, 128) — a (n1 x n1)
        matmul against (n1, 8*128), twiddle fused;
    pass B (stage 2):  z[k1, k2, w] = sum_j2 F2[j2, k2] y[k1, j2, w]
        grid over (k1, w); block (1, n2, 128) — a (n2 x n2) matmul.

    The inverse runs B-style (contract k2), then A-style with the
    conjugate matrices; the spectrum filter multiply is fused into the
    first inverse pass.

HBM passes per 2-D transform: 3 (vs XLA FFT's ~13 radix passes).
Numerics identical to the split-order reference pipeline
(ops/pallas_fft.py); see tests/test_pallas_fft.py.
"""

from __future__ import annotations

import contextlib
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fft import _plan

_INTERPRET = False


def _set_interpret(flag: bool):
    global _INTERPRET
    _INTERPRET = flag


def rfused_mosaic_ok(ph: int, pw: int) -> bool:
    """Whether Mosaic can compile the packed-real kernel pipeline at
    this padded grid: the in-kernel ``(br, m) -> (br, n1, n2)`` reshape
    needs tile-aligned dims (n1 % 8 == 0, n2 % 128 == 0) and the
    half-width planes must keep 128-aligned lanes for the H kernels.
    Small grids (tests, bench verification) fall back to interpret."""
    from .pallas_fft import _factor

    mh = pw // 2
    n1w, n2w = _factor(mh)
    n1h, n2h = _factor(ph)
    return (mh % 128 == 0 and n2w % 128 == 0 and n1w % 8 == 0
            and n2h % 128 == 0 and n1h % 8 == 0)


def complex_mosaic_ok(ph: int, pw: int, cols: int) -> bool:
    """Whether Mosaic can compile the full-width complex pipeline at
    these LOCAL pencil shapes (the spatially-sharded path: W kernels see
    (rows_local, pw) planes, H kernels see (ph, cols) pencils).  Same
    tile-alignment rules as :func:`rfused_mosaic_ok`; small grids fall
    back to interpret / the XLA split backend."""
    from .pallas_fft import _factor

    n1w, n2w = _factor(pw)
    n1h, n2h = _factor(ph)
    return (pw % 128 == 0 and n2w % 128 == 0 and n1w % 8 == 0
            and cols % 128 == 0 and n2h % 128 == 0 and n1h % 8 == 0)


@contextlib.contextmanager
def forced_interpret(flag: bool):
    """Trace-time escape hatch: run kernels in interpret mode when the
    grid is Mosaic-unsupported (rfused_mosaic_ok) without touching the
    global test toggle."""
    global _INTERPRET
    old = _INTERPRET
    _INTERPRET = _INTERPRET or flag
    try:
        yield
    finally:
        _INTERPRET = old


def _mats(n, inverse):
    F1r, F1i, F2r, F2i, Tr, Ti, scale, n1, n2 = _plan(n, inverse)
    mm = _mat_dtype()
    return (jnp.asarray(F1r, mm), jnp.asarray(F1i, mm),
            jnp.asarray(F2r, mm), jnp.asarray(F2i, mm),
            jnp.asarray(Tr), jnp.asarray(Ti),
            float(scale), n1, n2)


# f32-exactness on the MXU by default; LPT_PALLAS_PRECISION=default
# selects single-pass bf16 matmuls (3x less MXU compute, ~1e-3 relative
# error per transform — quality-verify before trusting, see bench.py)
import os as _os

_PREC = (jax.lax.Precision.DEFAULT
         if _os.environ.get("LPT_PALLAS_PRECISION", "").lower() == "default"
         else jax.lax.Precision.HIGHEST)


def _mat_dtype():
    """Storage dtype of the MATMUL stage matrices (F1/F2 stacks).  At
    Precision.DEFAULT the MXU truncates f32 operands to bf16 anyway, so
    storing the constant matrices in bf16 is numerically identical and
    roughly halves their scoped-VMEM footprint (~2.2 MB per rplan stack
    at 12MP) — headroom for bigger row blocks.  Opt-in (LPT_MATS_BF16=1)
    and only honored at DEFAULT precision (under HIGHEST it WOULD
    change numerics).  Round-4 measurement: the bf16 mats cost ~0.14 ms
    in the dual-state kernel (per-use upcasts) and the hoped-for 48-row
    block unlock still OOMs, while _prune_mats alone freed enough VMEM
    for the saturation channel — so f32 stays the default.  Twiddle/
    unpack fields are always f32 (elementwise VPU math never
    truncates)."""
    if (_os.environ.get("LPT_MATS_BF16", "0") == "1"
            and _PREC == jax.lax.Precision.DEFAULT):
        return jnp.bfloat16
    return jnp.float32

# Inter-kernel spectrum storage dtype.  LPT_SPLIT_IO=bf16 stores the
# split-order spectra handed between kernels in bfloat16, halving the
# dominant HBM traffic of the conv chain; kernels upcast on load and
# compute in f32 (the MXU already runs bf16 at Precision.DEFAULT, so
# this adds only storage rounding, ~3e-3 relative — quality-gated in
# bench.py like the bf16 matmul path).  Default float32 is exact.
_IO_DTYPE = (jnp.bfloat16
             if _os.environ.get("LPT_SPLIT_IO", "").lower() == "bf16"
             else jnp.float32)

# Carry-plane storage dtype (the {v, b, a0, a1} dual-rebuild carries of
# the e1 kernels).  bf16 injects rounding into the dual ACCUMULATION
# each iteration (unlike the io spectra, which are re-derived), so it
# is a separate, default-off knob: LPT_CARRY_IO=bf16 — quality-gate
# before trusting (bench.py measures the PSNR delta).
_CARRY_DTYPE = (jnp.bfloat16
                if _os.environ.get("LPT_CARRY_IO", "").lower() == "bf16"
                else jnp.float32)

# Per-plane carry dtypes.  The v carry (data-fidelity dual) accumulates
# with data-dependent range, so it stays at the global _CARRY_DTYPE
# (f32 default: bf16 costs ~2.4 dB by n_iter=300).  The TV-side carries
# {a0, a1, b} are KKT-BOUNDED — |eta| <= tau from the soft-threshold
# optimality, |b| ~ mu3*|image| — so they quantize to int16 fixed point
# at trace-time scales derived from the ADMM parameters with NO
# measurable quality loss (-0.04 dB at n=300, bench-gated).  On this
# TPU f32 HBM streaming sustains only ~340-390 GB/s vs ~790-890 for
# 2-byte dtypes (scripts/dev/_probe_bw.py; float16 is UNSUPPORTED —
# crashes libtpu), so the int16 TV carries save ~3x their byte count.
# LPT_CARRY_TV in {f32 (default — exact), i16, bf16}; bench.py runs
# i16 behind its PSNR quality gates.
_CARRY_TV = _os.environ.get("LPT_CARRY_TV", "").lower()
_CARRY_TV_DTYPE = {"i16": jnp.int16, "bf16": jnp.bfloat16}.get(
    _CARRY_TV, _CARRY_DTYPE)

# The v carry (v = mu1*X - xi).  |v| is mu1-SCALED: mu1*X <= mu1 for
# max-normalized measurements and xi accumulates mu1-sized steps, so
# the observed 300-iteration max is ~14*mu1 on the smooth bench scenes
# (scripts/dev/_probe_vquant.py) and ~58*mu1 on the high-dynamic-range
# gate scene (sharp sources drive the data dual much harder — measured
# via the in-kernel saturation channel, round 4).  int16 fixed point at
# 256*mu1 full scale (~2x headroom over the worst gated scene, whose
# max fraction is 0.53; resolution 7.8e-3*mu1, ~12.5 effective bits
# for the typical 14-85*mu1 signal)
# costs <= 0.06 dB at n_iter=300 — unlike bf16 (-2.4 dB: only 8
# mantissa bits against an accumulating random walk).  The scale is NOT
# a guarantee for arbitrary data (duals are unbounded in general):
# every store is monitored by the saturation channel below, and
# bench.py fails its gates if any carry ever reaches full scale.
# Opt-in (LPT_CARRY_V=i16), bench-gated; LPT_V_SCALE overrides the
# full-scale multiple.
_CARRY_V = _os.environ.get("LPT_CARRY_V", "").lower()
_CARRY_V_DTYPE = {"i16": jnp.int16, "bf16": jnp.bfloat16}.get(
    _CARRY_V, _CARRY_DTYPE)

_V_SCALE_MULT = float(_os.environ.get("LPT_V_SCALE", "256"))


def _v_scale(mu1):
    """Fixed-point full scale for the int16 v carry (see above)."""
    return _V_SCALE_MULT * mu1


def encode_v(x, mu1):
    """Encode an f32 v plane into the carry storage dtype (XLA-side
    counterpart of _store_carry, for loop-state initialization)."""
    if _CARRY_V_DTYPE == jnp.int16:
        s = 32767.0 / _v_scale(mu1)
        return jnp.round(jnp.clip(x * s, -32767.0, 32767.0)
                         ).astype(jnp.int16)
    return x.astype(_CARRY_V_DTYPE)


def _io_bj_default():
    """Default pass-A j-block: 32 at 2-byte io, 16 at f32 io.  The pair
    kernel holds 8 double-buffered data blocks plus ~6 live f32
    temporaries per plane; at 4-byte io the 32-block footprint exceeds
    the 16 MB scoped-VMEM limit by ~8 MB at 12 MP (measured compile
    OOM), so the f32 fallback path halves the block."""
    return 32 if jnp.dtype(_IO_DTYPE).itemsize == 2 else 16


def _io_kb_default():
    """Default pass-B/combine k-block, io-dtype-aware like
    :func:`_io_bj_default` (the combine-dual kernel holds 11 data
    blocks; 4-byte io at kb=8 sits against the scoped-VMEM limit).
    2-byte io default is 12 (n1=48 at the 12MP grid): the round-4
    sweep measured 1.85 ms vs 2.14 at kb=8 — the kernel is bound by
    GRID-STEP count, not matmul width (kb=4/bw=256 with identical
    VMEM and half the matmul issues timed identically; kb=16 still
    exceeds scoped VMEM) — and 12 is the largest fitting divisor."""
    return 12 if jnp.dtype(_IO_DTYPE).itemsize == 2 else 4


def _tv_scales(mu2, mu3, tau):
    """Fixed-point full-scale values for the int16 TV carries, from the
    KKT bounds (assumes max-normalized measurements, the standard
    pipeline): |a| <= tau + mu2*|psi| -> 8*tau headroom; |b| <=
    mu3*|image| -> 32*mu3."""
    return 8.0 * tau, 32.0 * mu3


def _load_carry(x, scale):
    """Decode a carried plane to f32 (int16 fixed point or float)."""
    if x.dtype == jnp.int16:
        return x.astype(jnp.float32) * (scale / 32767.0)
    return x.astype(jnp.float32)


def _store_carry(ref, x, scale):
    """Quantize + store a carry plane; returns the STORED value (int16
    path) so callers can run cheap post-clip saturation detection on the
    2-byte data instead of the f32 pre-image."""
    if ref.dtype == jnp.int16:
        s = 32767.0 / scale
        q = jnp.round(jnp.clip(x * s, -32767.0, 32767.0)).astype(jnp.int16)
        ref[:] = q
        return q
    ref[:] = x.astype(ref.dtype)
    return None


# ---------------------------------------------------------------------------
# Carry-saturation monitoring (safety for the fixed-point carries).
#
# The int16 full scales (_v_scale, _tv_scales) are derived from the ADMM
# parameters under assumptions (max-normalized measurements, KKT bounds,
# observed dual-accumulation headroom).  A scene outside those
# assumptions would CLIP the carry silently.  The v3 state kernels
# therefore emit a per-call saturation channel: the max |carry| seen at
# STORE time (pre-quantization, f32) normalized by its full scale, max-
# accumulated across grid steps into a tiny (8, 128) block that stays
# VMEM-resident (constant index map).  A value >= 1.0 means at least one
# element clipped; the solver surfaces the running max so bench gates
# can assert sat < 1 on every quality-gated run (VERDICT r3 #3).
# Overhead: one VPU max-reduce over data already in registers + a
# 4 KB write per grid step — unmeasurable against the matmul cores.
# ---------------------------------------------------------------------------

_SAT_BLOCK = (8, 128)

# LPT_SAT=0 disables the in-kernel saturation computation (the channel
# still exists but reads 0.0) — for timing bisection only; the bench
# quality gates REQUIRE the live channel.
_SAT_ENABLED = _os.environ.get("LPT_SAT", "1") != "0"


def _sat_spec():
    return pl.BlockSpec(_SAT_BLOCK, lambda i: (0, 0),
                        memory_space=pltpu.VMEM)


def _sat_shape():
    return jax.ShapeDtypeStruct(_SAT_BLOCK, jnp.float32)


def _sat_update(sat_ref, frac):
    """Init-on-first-step + max-accumulate into the resident block."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        sat_ref[:] = jnp.zeros(_SAT_BLOCK, jnp.float32)

    sat_ref[:] = jnp.maximum(sat_ref[:], frac)


def _sat_zero(sat_ref):
    """Unquantized carries can't clip: emit a zero channel for free."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        sat_ref[:] = jnp.zeros(_SAT_BLOCK, jnp.float32)


def _sat_scan_kernel(x_ref, sat_ref):
    x = x_ref[:].astype(jnp.float32)
    _sat_update(sat_ref, jnp.maximum(jnp.max(x), -jnp.min(x))
                * (1.0 / 32767.0))


def sat_scan_i16(x, block_rows=128):
    """Saturation fraction of a STORED int16 carry plane as a dedicated
    tiny kernel: max |x| / 32767 accumulated into the resident (8, 128)
    block.  |stored|/32767 == min(pre-quant fraction, 1), so headroom
    below full scale AND clip detection both survive; only overshoot
    magnitude beyond 1.0 is lost.  Reading the plane costs ~0.12 ms at
    12MP (bandwidth-bound) — sampled every LPT_SAT_EVERY iterations
    that is ~0.015 ms/iter, an order cheaper than the in-kernel f32
    reduce, and it keeps the hot dual-state kernel variant-free (cond
    or nested-loop contexts inflate a kernel's scoped VMEM by
    0.4-0.9 MB — fatal for the 32-row block, harmless for this one)."""
    m, w = x.shape
    br = _pick_block(m, block_rows)
    return pl.pallas_call(
        _sat_scan_kernel,
        grid=(m // br,),
        in_specs=[pl.BlockSpec((br, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=_sat_spec(),
        out_shape=_sat_shape(),
        interpret=_INTERPRET,
    )(x)


def carry_sat_fraction(x, scale):
    """XLA-side saturation fraction of a STORED carry plane (fallback
    paths without the in-kernel channel).  For int16 this can only
    report up to 1.0 (post-clip); the in-kernel channel sees the
    pre-quantization value and reports true overshoot."""
    if x.dtype == jnp.int16:
        return jnp.max(jnp.abs(x.astype(jnp.float32))) / 32767.0
    return jnp.max(jnp.abs(x.astype(jnp.float32))) / scale


_BATCHED_DG = _os.environ.get("LPT_INV_BATCHED_DG", "1") != "0"

# Concat-fusion (round 3): every pair of same-matrix transform passes in
# the hot pipeline (the rk/v forward pass-A, the a0/a1 inverse pass-A,
# the four stage-2 contractions inside the combine kernel, and the two
# W-inverse cores of the dual state kernel) is merged into ONE pass over
# operands concatenated along a free axis.  Same FLOPs, half the MXU
# instruction count — the pipeline is latency-bound on small-matmul
# issue overhead at 12MP (measured: 38% of HBM SOL with ~18k matmul
# invocations/iter), so fewer, wider matmuls directly cut wall time.
_CONCAT_FUSE = _os.environ.get("LPT_CONCAT_FUSE", "1") != "0"


def _dg_left(mat, t3):
    """Batched (br, P, Q) -> (br, R, Q) contraction with the (R, P)
    matrix broadcast on the LEFT: z[b, r, q] = sum_p mat[r, p] t[b, p, q].
    Output keeps Q minor — used to skip the trailing transpose in the
    inverse W cores (LPT_INV_BATCHED_DG=1)."""
    br = t3.shape[0]
    # mixed-dtype operands (bf16 mats x f32 data or vice versa) lower as
    # native mixed-precision matmuls — do NOT insert casts here: a
    # per-grid-step operand cast measured as a multi-hundred-us tax
    # across the pipeline (round-5 end-to-end regression hunt)
    mb = jnp.broadcast_to(mat, (br,) + mat.shape)
    return jax.lax.dot_general(
        mb, t3, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=_PREC)


# Multi-row M-dim fold (round 5, VERDICT r4 #1): the packed-real W cores'
# lane contractions ran as per-row-block batched/3-D dot_generals — at
# 12MP each grid step issued O(br) small (32, 256)x(256, 128) matmuls
# and the pipeline is bound by per-matmul sequencer latency, not HBM
# bytes (NOTES.md round-3 accounting).  With the fold every lane
# contraction collapses to ONE (br*n1, 2n2) @ (2n2, 2n2) matmul (the
# leading-dim merge is layout-free: n1 % 8 == 0, lanes untouched), and
# real/imag output pairs sharing an operand ride ONE matmul against
# host-prestacked matrices (rows for left operands, lanes for right) —
# splits at 128-lane / 8-sublane boundaries are free.
_MM_FOLD = _os.environ.get("LPT_MM_FOLD", "1") != "0"
# finer knobs for the fold pieces inside the dual-inverse STATE kernel,
# which measured AGAINST the fold on-chip (round-5 A/B at 12MP: all-
# unfolded 2.13 ms; fwd folded 2.41-2.42; fwd+inv folded 2.28; inv-only
# folded 2.20) while e1_rtv's fwd fold won 2.08x — the kernel holds two
# mats stacks + the v carry and its scoped-VMEM/scheduling context
# flips the trade.  Defaults: dual-state pieces OFF, everything else ON.
_MM_FOLD_INV = _os.environ.get("LPT_MM_FOLD_INV", "0") != "0"
_MM_FOLD_INV_FINAL = (_os.environ.get("LPT_MM_FOLD_INV_FINAL", "").lower() or
                      ("1" if _MM_FOLD_INV else "0")) != "0"
_MM_FOLD_STATE_FWD = _os.environ.get("LPT_MM_FOLD_STATE_FWD", "0") != "0"


def _dgB2(v3, mat):
    """Lane contraction (b, a, p) x (p, q) -> (b, a, q) as ONE flattened
    matmul: merging (b, a) is a pure leading-dim reshape (a % 8 == 0 at
    every supported grid), so the MXU sees a single M = b*a matmul
    instead of b batched M = a ones."""
    b, a, p = v3.shape
    return _mm(v3.reshape(b * a, p), mat).reshape(b, a, mat.shape[1])


def _mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_PREC)


# ---------------------------------------------------------------------------
# H pass A: stage 1 + twiddle.  x viewed (n1, n2, W); block (n1, BJ, BW)
# ---------------------------------------------------------------------------


def _h_passA_kernel(n1, bj, scale, twiddle_first, xr_ref, xi_ref, f1r, f1i,
                    tr, ti, or_ref, oi_ref):
    _, _, bw = xr_ref.shape
    # twiddle arrives PRE-BLOCKED host-side as (n2//bj, n1, bj) so the
    # kernel reads its (n1, bj) slice directly — the old (n2, n1) layout
    # (sublane-sliced for alignment) needed an in-kernel transpose.
    # With LPT_KSTACK the f1r/f1i refs hold the K-STACKED matrices
    # ([F1r | -F1i] and [F1i | F1r], (n1, 2n1)) and each complex
    # contraction is ONE matmul against [xr; xi].
    twr = tr[:][0][:, :, None]
    twi = ti[:][0][:, :, None]
    if twiddle_first:
        # inverse: twiddle on the incoming [k1, j2] indices, then contract k1
        xr3 = xr_ref[:].astype(jnp.float32)
        xi3 = xi_ref[:].astype(jnp.float32)
        xr3, xi3 = xr3 * twr - xi3 * twi, xr3 * twi + xi3 * twr
        xr = xr3.reshape(n1, bj * bw)
        xi = xi3.reshape(n1, bj * bw)
        if _KSTACK:
            zr, zi = _s1_pair(f1r, f1i, xr, xi, n1, bj, bw)
        else:
            zr = (_mm(f1r[:], xr) - _mm(f1i[:], xi)).reshape(n1, bj, bw)
            zi = (_mm(f1r[:], xi) + _mm(f1i[:], xr)).reshape(n1, bj, bw)
    else:
        # forward: contract j1, then twiddle on the produced [k1, j2]
        xr = xr_ref[:].astype(jnp.float32).reshape(n1, bj * bw)
        xi = xi_ref[:].astype(jnp.float32).reshape(n1, bj * bw)
        if _KSTACK:
            yr, yi = _s1_pair(f1r, f1i, xr, xi, n1, bj, bw)
        else:
            yr = (_mm(f1r[:], xr) - _mm(f1i[:], xi)).reshape(n1, bj, bw)
            yi = (_mm(f1r[:], xi) + _mm(f1i[:], xr)).reshape(n1, bj, bw)
        zr = yr * twr - yi * twi
        zi = yr * twi + yi * twr
    if scale != 1.0:
        zr = zr * scale
        zi = zi * scale
    or_ref[:] = zr.astype(or_ref.dtype)
    oi_ref[:] = zi.astype(oi_ref.dtype)


def _stack_s1(F1r, F1i):
    """K-stacked stage-1 matrices for the pass-A kernels."""
    return (jnp.concatenate([F1r, -F1i], axis=1),
            jnp.concatenate([F1i, F1r], axis=1))


def _fold_s1(m1r, m1i):
    """M-stack a K-stacked stage-1 pair for LPT_MM_FOLD: one (2n1, 2n1)
    matmul emits both outputs; the imag operand becomes a dummy ref."""
    return (jnp.concatenate([m1r, m1i], axis=0),
            jnp.zeros((8, 128), m1r.dtype))


def _s1_pair(f1r_ref, f1i_ref, xr, xi, n1, bj, bw):
    """K-stacked stage-1 complex contraction of [xr; xi] -> (zr, zi);
    under LPT_MM_FOLD both outputs come from ONE matmul (row split at
    the free 8-sublane boundary)."""
    x = jnp.concatenate([_as_t(xr), _as_t(xi)], axis=0)
    if _MM_FOLD:
        z = _mm(f1r_ref[:], x)
        return z[:n1].reshape(n1, bj, bw), z[n1:].reshape(n1, bj, bw)
    return (_mm(f1r_ref[:], x).reshape(n1, bj, bw),
            _mm(f1i_ref[:], x).reshape(n1, bj, bw))


def _pick_block(n, target):
    """Largest divisor of n that is <= target and a multiple of target's
    alignment (or n itself)."""
    if n <= target:
        return n
    b = target
    while n % b:
        b -= 1
    return b


def _w_block_rows(m, w):
    """Row-block size for the W kernels sized to the VMEM budget: the
    kernel holds ~8 block-sized f32 buffers (in/out double buffering +
    stage intermediates)."""
    budget_rows = max(8, int(5 * 2**20 / (w * 4 * 8)) // 8 * 8)
    return _pick_block(m, min(64, budget_rows))


def h_passA(xr, xi, n, inverse, bj=None, bw=None):
    """x planes shaped (n1, n2, W)."""
    F1r, F1i, F2r, F2i, Tr, Ti, scale, n1, n2 = _mats(n, inverse)
    _, _, w = xr.shape
    bj = bj or (n2 if n2 % 8 else min(int(_os.environ.get("LPT_PALLAS_BJ") or _io_bj_default()), n2))
    bw = bw or (w if w % 128 else min(int(_os.environ.get("LPT_PALLAS_BW", "128")), w))
    data_spec = pl.BlockSpec((n1, bj, bw), lambda j, k: (0, j, k),
                             memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((n1, n1), lambda j, k: (0, 0),
                            memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((1, n1, bj), lambda j, k: (j, 0, 0),
                           memory_space=pltpu.VMEM)
    # twiddle pre-blocked: stack of (n1, bj) tiles, one per j-block
    # (trace-time jnp reshape/transpose — loop-invariant, hoisted by XLA)
    Trb = jnp.transpose(Tr.reshape(n1, n2 // bj, bj), (1, 0, 2))
    Tib = jnp.transpose(Ti.reshape(n1, n2 // bj, bj), (1, 0, 2))
    out_dt = _IO_DTYPE
    m1r, m1i = (_stack_s1(F1r, F1i) if _KSTACK else (F1r, F1i))
    if _KSTACK and _MM_FOLD:
        m1r, m1i = _fold_s1(m1r, m1i)
    mat_specs = [pl.BlockSpec(a.shape, lambda j, k: (0, 0),
                              memory_space=pltpu.VMEM) for a in (m1r, m1i)]
    return pl.pallas_call(
        partial(_h_passA_kernel, n1, bj, scale if inverse else 1.0, inverse),
        grid=(n2 // bj, w // bw),
        in_specs=[data_spec, data_spec] + mat_specs + [tw_spec, tw_spec],
        out_specs=(data_spec, data_spec),
        out_shape=(jax.ShapeDtypeStruct((n1, n2, w), out_dt),
                   jax.ShapeDtypeStruct((n1, n2, w), out_dt)),
        interpret=_INTERPRET,
    )(xr, xi, m1r, m1i, Trb, Tib)


def _h_passA_pair_kernel(n1, bj, scale, twiddle_first,
                         x1r_ref, x1i_ref, x2r_ref, x2i_ref, f1r, f1i,
                         tr, ti, o1r_ref, o1i_ref, o2r_ref, o2i_ref):
    """Pass A on TWO plane pairs in one grid step: the planes are
    concatenated along the LANE axis so each stage-1 matmul runs at
    double free width — half the MXU instruction count of two separate
    h_passA calls (and half the grid steps)."""
    _, _, bw = x1r_ref.shape
    twr = tr[:][0][:, :, None]
    twi = ti[:][0][:, :, None]
    f32 = jnp.float32

    def one_plane(xr_ref, xi_ref, or_ref, oi_ref):
        # per-plane, concat-free: the former lane-concat of the two
        # planes cost full-block VPU copies per step
        xr3 = xr_ref[:].astype(f32)
        xi3 = xi_ref[:].astype(f32)
        if twiddle_first:
            xr3, xi3 = xr3 * twr - xi3 * twi, xr3 * twi + xi3 * twr
            xr = xr3.reshape(n1, bj * bw)
            xi = xi3.reshape(n1, bj * bw)
            if _KSTACK:
                zr, zi = _s1_pair(f1r, f1i, xr, xi, n1, bj, bw)
            else:
                zr = (_mm(f1r[:], xr) - _mm(f1i[:], xi)).reshape(n1, bj, bw)
                zi = (_mm(f1r[:], xi) + _mm(f1i[:], xr)).reshape(n1, bj, bw)
        else:
            xr = xr3.reshape(n1, bj * bw)
            xi = xi3.reshape(n1, bj * bw)
            if _KSTACK:
                yr, yi = _s1_pair(f1r, f1i, xr, xi, n1, bj, bw)
            else:
                yr = (_mm(f1r[:], xr) - _mm(f1i[:], xi)).reshape(n1, bj, bw)
                yi = (_mm(f1r[:], xi) + _mm(f1i[:], xr)).reshape(n1, bj, bw)
            zr = yr * twr - yi * twi
            zi = yr * twi + yi * twr
        if scale != 1.0:
            zr = zr * scale
            zi = zi * scale
        or_ref[:] = zr.astype(or_ref.dtype)
        oi_ref[:] = zi.astype(oi_ref.dtype)

    one_plane(x1r_ref, x1i_ref, o1r_ref, o1i_ref)
    one_plane(x2r_ref, x2i_ref, o2r_ref, o2i_ref)


def h_passA_pair(x1r, x1i, x2r, x2i, n, inverse, bj=None, bw=None):
    """Two same-matrix pass-A transforms in one pallas call (see
    _h_passA_pair_kernel); planes shaped (n1, n2, W).  Returns
    ((z1r, z1i), (z2r, z2i))."""
    F1r, F1i, F2r, F2i, Tr, Ti, scale, n1, n2 = _mats(n, inverse)
    _, _, w = x1r.shape
    bj = bj or (n2 if n2 % 8 else min(int(_os.environ.get("LPT_PALLAS_BJ") or _io_bj_default()), n2))
    bw = bw or (w if w % 128 else min(int(_os.environ.get("LPT_PALLAS_BW", "128")), w))
    data_spec = pl.BlockSpec((n1, bj, bw), lambda j, k: (0, j, k),
                             memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((n1, n1), lambda j, k: (0, 0),
                            memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((1, n1, bj), lambda j, k: (j, 0, 0),
                           memory_space=pltpu.VMEM)
    Trb = jnp.transpose(Tr.reshape(n1, n2 // bj, bj), (1, 0, 2))
    Tib = jnp.transpose(Ti.reshape(n1, n2 // bj, bj), (1, 0, 2))
    shape = jax.ShapeDtypeStruct((n1, n2, w), _IO_DTYPE)
    m1r, m1i = (_stack_s1(F1r, F1i) if _KSTACK else (F1r, F1i))
    if _KSTACK and _MM_FOLD:
        m1r, m1i = _fold_s1(m1r, m1i)
    mat_specs = [pl.BlockSpec(a.shape, lambda j, k: (0, 0),
                              memory_space=pltpu.VMEM) for a in (m1r, m1i)]
    z1r, z1i, z2r, z2i = pl.pallas_call(
        partial(_h_passA_pair_kernel, n1, bj, scale if inverse else 1.0,
                inverse),
        grid=(n2 // bj, w // bw),
        in_specs=[data_spec] * 4 + mat_specs + [tw_spec] * 2,
        out_specs=(data_spec,) * 4,
        out_shape=(shape,) * 4,
        interpret=_INTERPRET,
    )(x1r, x1i, x2r, x2i, m1r, m1i, Trb, Tib)
    return (z1r, z1i), (z2r, z2i)


# ---------------------------------------------------------------------------
# H pass B: stage 2.  y viewed (n1, n2, W); block (1, n2, BW)
# ---------------------------------------------------------------------------


def _h_passB_kernel(n2, fuse_filter, yr_ref, yi_ref, *rest):
    if fuse_filter:
        fr_ref, fi_ref, f2r, f2i, or_ref, oi_ref = rest
    else:
        f2r, f2i, or_ref, oi_ref = rest
    kb, _, bw = yr_ref.shape
    yr = yr_ref[:].astype(jnp.float32)          # (kb, n2, bw)
    yi = yi_ref[:].astype(jnp.float32)
    if fuse_filter:
        # spectrum multiply BEFORE the inverse contraction begins
        fr = fr_ref[:].astype(jnp.float32)
        fi = fi_ref[:].astype(jnp.float32)
        yr, yi = (yr * fr - yi * fi, yr * fi + yi * fr)
    # fold the kb and w free axes so one (n2 x n2) matmul covers the block
    yr2 = jnp.swapaxes(yr, 0, 1).reshape(n2, kb * bw)
    yi2 = jnp.swapaxes(yi, 0, 1).reshape(n2, kb * bw)
    # z[k2, .] = sum_j2 F2[j2, k2] y[j2, .]  ->  F2^T @ y; F2 symmetric
    zr = _mm(f2r[:], yr2) - _mm(f2i[:], yi2)
    zi = _mm(f2r[:], yi2) + _mm(f2i[:], yr2)
    or_ref[:] = jnp.swapaxes(zr.reshape(n2, kb, bw), 0, 1).astype(or_ref.dtype)
    oi_ref[:] = jnp.swapaxes(zi.reshape(n2, kb, bw), 0, 1).astype(oi_ref.dtype)


def h_passB(yr, yi, n, inverse, filt_r=None, filt_i=None, bw=None, kb=None):
    F1r, F1i, F2r, F2i, Tr, Ti, scale, n1, n2 = _mats(n, inverse)
    _, _, w = yr.shape
    bw = bw or (w if w % 128 else min(int(_os.environ.get("LPT_PALLAS_BW", "128")), w))
    kb = kb or _pick_block(n1, int(_os.environ.get("LPT_PALLAS_KB") or _io_kb_default()))
    data_spec = pl.BlockSpec((kb, n2, bw), lambda i, k: (i, 0, k),
                             memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((n2, n2), lambda i, k: (0, 0),
                            memory_space=pltpu.VMEM)
    fuse = filt_r is not None
    ins = [yr, yi] + ([filt_r, filt_i] if fuse else [])
    in_specs = [data_spec] * len(ins) + [mat_spec, mat_spec]
    return pl.pallas_call(
        partial(_h_passB_kernel, n2, fuse),
        grid=(n1 // kb, w // bw),
        in_specs=in_specs,
        out_specs=(data_spec, data_spec),
        out_shape=(jax.ShapeDtypeStruct((n1, n2, w), _IO_DTYPE),
                   jax.ShapeDtypeStruct((n1, n2, w), _IO_DTYPE)),
        interpret=_INTERPRET,
    )(*ins, F2r, F2i)


def fft_h(vr, vi, h):
    """Forward H transform of (H, W) planes -> split order (H, W)."""
    _, _, _, _, _, _, _, n1, n2 = _mats(h, False)
    w = vr.shape[-1]
    xr = vr.reshape(n1, n2, w)
    xi = vi.reshape(n1, n2, w)
    yr, yi = h_passA(xr, xi, h, False)
    zr, zi = h_passB(yr, yi, h, False)
    return zr.reshape(h, w), zi.reshape(h, w)


def ifft_h(vr, vi, h, filt_r=None, filt_i=None):
    """Inverse from split order; optional fused filter multiply applied
    BEFORE the transform (i.e. on the split-order spectrum)."""
    _, _, _, _, _, _, _, n1, n2 = _mats(h, True)
    w = vr.shape[-1]
    xr = vr.reshape(n1, n2, w)
    xi = vi.reshape(n1, n2, w)
    fr = filt_r.reshape(n1, n2, w) if filt_r is not None else None
    fi = filt_i.reshape(n1, n2, w) if filt_i is not None else None
    # inverse: inner contract k2 (pass B with inverse mats, filter fused),
    # then twiddle+contract k1 (pass A with inverse mats, scale applied)
    ar, ai = h_passB(xr, xi, h, True, fr, fi)
    zr, zi = h_passA(ar, ai, h, True)
    return zr.reshape(h, w), zi.reshape(h, w)


# ---------------------------------------------------------------------------
# W axis: single-kernel row transforms (valid blocks: (BR, W))
# ---------------------------------------------------------------------------


def _w_fwd_core(x2d, n1, n2, f1r, f1i, f2r, f2i, trt, tit):
    """Two-stage split-order forward W transform of (br, n1*n2) rows;
    returns (zr, zi) as (br, n1*n2) f32.

    (The round-2 j2-major lane-layout variant was removed: Mosaic only
    lowers its (br, m) <-> (br, n2, n1) shape casts when BOTH factors
    are 128-aligned, i.e. W >= 16384 — no supported grid uses it; see
    NOTES.md round-2 post-mortem.)"""
    br = x2d.shape[0]
    xs = x2d.reshape(br, n1, n2)
    # stage 1: contract j1 -> (br, n2, n1)
    yr = jax.lax.dot_general(xs, f1r, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=_PREC)
    yi = jax.lax.dot_general(xs, f1i, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=_PREC)
    tr = yr * trt - yi * tit
    ti = yr * tit + yi * trt
    # stage 2: contract j2 -> (br, n1, n2)
    zr = jax.lax.dot_general(tr, f2r, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=_PREC) - \
         jax.lax.dot_general(ti, f2i, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=_PREC)
    zi = jax.lax.dot_general(tr, f2i, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=_PREC) + \
         jax.lax.dot_general(ti, f2r, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=_PREC)
    return zr.reshape(br, n1 * n2), zi.reshape(br, n1 * n2)


def _w_inv_core(xr2d, xi2d, n1, n2, scale, f1r, f1i, f2r, f2i, trt, tit):
    """Two-stage split-order inverse W transform; returns the real part
    as (br, n1*n2) f32."""
    br = xr2d.shape[0]
    xr = xr2d.reshape(br, n1, n2)
    xi = xi2d.reshape(br, n1, n2)
    # inner: contract k2 -> (br, n1, j2)
    ar = jax.lax.dot_general(xr, f2r, (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=_PREC) - \
         jax.lax.dot_general(xi, f2i, (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=_PREC)
    ai = jax.lax.dot_general(xr, f2i, (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=_PREC) + \
         jax.lax.dot_general(xi, f2r, (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=_PREC)
    # twiddle T[k1, j2] = trt^T
    tr_ = ar * trt.T - ai * tit.T
    ti_ = ar * tit.T + ai * trt.T
    if _BATCHED_DG:
        # outer contraction as a batched matmul with the stage matrix on
        # the left: output lands directly in natural (br, j1, j2) order —
        # no trailing minor-dim transpose
        zr = _dg_left(f1r, tr_) - _dg_left(f1i, ti_)
        return (zr * scale).reshape(br, n1 * n2)
    # outer: contract k1 -> (br, j2, j1); only the real part is needed
    zr = jax.lax.dot_general(tr_, f1r, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=_PREC) - \
         jax.lax.dot_general(ti_, f1i, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=_PREC)
    return (jnp.swapaxes(zr, 1, 2) * scale).reshape(br, n1 * n2)


def _w_fwd_kernel(n1, n2, x_ref, f1r, f1i, f2r, f2i, trt, tit, or_ref, oi_ref):
    zr, zi = _w_fwd_core(x_ref[:].astype(jnp.float32), n1, n2,
                         f1r[:], f1i[:], f2r[:], f2i[:], trt[:], tit[:])
    or_ref[:] = zr.astype(or_ref.dtype)
    oi_ref[:] = zi.astype(oi_ref.dtype)


def _w_inv_kernel(n1, n2, scale, vr_ref, vi_ref, f1r, f1i, f2r, f2i, trt, tit,
                  out_ref):
    out = _w_inv_core(vr_ref[:].astype(jnp.float32),
                      vi_ref[:].astype(jnp.float32), n1, n2, scale,
                      f1r[:], f1i[:], f2r[:], f2i[:], trt[:], tit[:])
    out_ref[:] = out.astype(out_ref.dtype)


def fft_w(x, block_rows=None):
    m, w = x.shape
    block_rows = block_rows or _w_block_rows(m, w)
    F1r_np, F1i_np, F2r_np, F2i_np, Tr_np, Ti_np, scale, n1, n2 = _plan(w, False)
    F1r, F1i = jnp.asarray(F1r_np), jnp.asarray(F1i_np)
    F2r, F2i = jnp.asarray(F2r_np), jnp.asarray(F2i_np)
    TrT = jnp.asarray(np.ascontiguousarray(Tr_np.T))
    TiT = jnp.asarray(np.ascontiguousarray(Ti_np.T))
    spec = pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    m1 = pl.BlockSpec((n1, n1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    m2 = pl.BlockSpec((n2, n2), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mt = pl.BlockSpec((n2, n1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_w_fwd_kernel, n1, n2),
        grid=(m // block_rows,),
        in_specs=[spec, m1, m1, m2, m2, mt, mt],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((m, w), _IO_DTYPE),
                   jax.ShapeDtypeStruct((m, w), _IO_DTYPE)),
        interpret=_INTERPRET,
    )(x, F1r, F1i, F2r, F2i, TrT, TiT)


def ifft_w(vr, vi, block_rows=None, out_dtype=jnp.float32):
    m, w = vr.shape
    block_rows = block_rows or _w_block_rows(m, w)
    F1r_np, F1i_np, F2r_np, F2i_np, Tr_np, Ti_np, scale, n1, n2 = _plan(w, True)
    F1r, F1i = jnp.asarray(F1r_np), jnp.asarray(F1i_np)
    F2r, F2i = jnp.asarray(F2r_np), jnp.asarray(F2i_np)
    TrT = jnp.asarray(np.ascontiguousarray(Tr_np.T))
    TiT = jnp.asarray(np.ascontiguousarray(Ti_np.T))
    spec = pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    m1 = pl.BlockSpec((n1, n1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    m2 = pl.BlockSpec((n2, n2), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mt = pl.BlockSpec((n2, n1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_w_inv_kernel, n1, n2, scale),
        grid=(m // block_rows,),
        in_specs=[spec, spec, m1, m1, m2, m2, mt, mt],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((m, w), out_dtype),
        interpret=_INTERPRET,
    )(vr, vi, F1r, F1i, F2r, F2i, TrT, TiT)


def filtered_synthesis_pallas2(x, filt_r, filt_i, block_rows=None):
    """irfft2(rfft2(x) * H) on (H, W); filter planes in split order."""
    h, w = x.shape
    block_rows = block_rows or _w_block_rows(h, w)
    wr, wi = fft_w(x, block_rows)
    hr, hi = fft_h(wr, wi, h)
    br, bi = ifft_h(hr, hi, h, filt_r, filt_i)
    return ifft_w(br, bi, block_rows)


# ---------------------------------------------------------------------------
# combine-fused forward pass B: stage 2 of the SECOND forward transform
# with the ADMM spectrum combine fused in.  Emits
#   f = R * (a + conj(H) * b)         (split-order planes)
# where b is this kernel's stage-2 result and a is the first forward's
# spectrum, read as an extra input — removes the separate XLA combine
# pass (write b, re-read a/b/H/R) from the iteration.
# ---------------------------------------------------------------------------


def _h_passB_combine_kernel(n2, yr_ref, yi_ref, ar_ref, ai_ref, hr_ref,
                            hi_ref, rr_ref, f2r, f2i, fr_out, fi_out):
    kb, _, bw = yr_ref.shape
    yr = yr_ref[:].astype(jnp.float32)
    yi = yi_ref[:].astype(jnp.float32)
    yr2 = jnp.swapaxes(yr, 0, 1).reshape(n2, kb * bw)
    yi2 = jnp.swapaxes(yi, 0, 1).reshape(n2, kb * bw)
    zr = _mm(f2r[:], yr2) - _mm(f2i[:], yi2)
    zi = _mm(f2r[:], yi2) + _mm(f2i[:], yr2)
    br = jnp.swapaxes(zr.reshape(n2, kb, bw), 0, 1)
    bi = jnp.swapaxes(zi.reshape(n2, kb, bw), 0, 1)
    ar = ar_ref[:].astype(jnp.float32)
    ai = ai_ref[:].astype(jnp.float32)
    hr = hr_ref[:].astype(jnp.float32)
    hi = hi_ref[:].astype(jnp.float32)
    rr = rr_ref[:].astype(jnp.float32)
    # conj(H) * b = (hr*br + hi*bi, hr*bi - hi*br)
    fr_out[:] = (rr * (ar + hr * br + hi * bi)).astype(fr_out.dtype)
    fi_out[:] = (rr * (ai + hr * bi - hi * br)).astype(fi_out.dtype)


def h_passB_combine(yr, yi, ar, ai, hr, hi, rr, n, bw=None, kb=None):
    """Stage-2 contraction of y fused with f = R * (a + conj(H) * b)."""
    _, _, _, _, _, _, _, n1, n2 = _mats(n, False)
    _, _, w = yr.shape
    bw = bw or (w if w % 128 else min(int(_os.environ.get("LPT_PALLAS_BW", "128")), w))
    kb = kb or _pick_block(n1, int(_os.environ.get("LPT_PALLAS_KB") or _io_kb_default()))
    data_spec = pl.BlockSpec((kb, n2, bw), lambda i, k: (i, 0, k),
                             memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((n2, n2), lambda i, k: (0, 0),
                            memory_space=pltpu.VMEM)
    F2r, F2i = _mats(n, False)[2:4]
    shape = jax.ShapeDtypeStruct((n1, n2, w), _IO_DTYPE)
    return pl.pallas_call(
        partial(_h_passB_combine_kernel, n2),
        grid=(n1 // kb, w // bw),
        in_specs=[data_spec] * 7 + [mat_spec, mat_spec],
        out_specs=(data_spec, data_spec),
        out_shape=(shape, shape),
        interpret=_INTERPRET,
    )(yr, yi, ar, ai, hr, hi, rr, F2r, F2i)


def fft_h_combine(vr, vi, ar, ai, hr, hi, rr, h):
    """Forward H transform of the second ADMM plane with the spectrum
    combine fused into its stage-2 kernel.  All spectrum operands are
    split-order (H, W) planes; returns (fr, fi) = R * (a + conj(H) b)."""
    _, _, _, _, _, _, _, n1, n2 = _mats(h, False)
    w = vr.shape[-1]
    ya_r, ya_i = h_passA(vr.reshape(n1, n2, w), vi.reshape(n1, n2, w), h, False)
    fr, fi = h_passB_combine(ya_r, ya_i,
                             ar.reshape(n1, n2, w), ai.reshape(n1, n2, w),
                             hr.reshape(n1, n2, w), hi.reshape(n1, n2, w),
                             rr.reshape(n1, n2, w), h)
    return fr.reshape(h, w), fi.reshape(h, w)


def _h_passB_combine2_kernel(n2, xr_ref, xi_ref, yr_ref, yi_ref, hr_ref,
                             hi_ref, rr_ref, f2r, f2i, fr_out, fi_out):
    """Stage-2 for BOTH forward planes in one kernel: a = F2^T x (the rk
    stage-A output), b = F2^T y (the v stage-A output), then
    f = R (a + conj(H) b) — the rk spectrum never crosses HBM."""
    kb, _, bw = xr_ref.shape

    def stage2(r_ref, i_ref):
        r2 = jnp.swapaxes(r_ref[:].astype(jnp.float32), 0, 1).reshape(n2, kb * bw)
        i2 = jnp.swapaxes(i_ref[:].astype(jnp.float32), 0, 1).reshape(n2, kb * bw)
        zr = _mm(f2r[:], r2) - _mm(f2i[:], i2)
        zi = _mm(f2r[:], i2) + _mm(f2i[:], r2)
        return (jnp.swapaxes(zr.reshape(n2, kb, bw), 0, 1),
                jnp.swapaxes(zi.reshape(n2, kb, bw), 0, 1))

    ar, ai = stage2(xr_ref, xi_ref)
    br, bi = stage2(yr_ref, yi_ref)
    hr = hr_ref[:].astype(jnp.float32)
    hi = hi_ref[:].astype(jnp.float32)
    rr = rr_ref[:].astype(jnp.float32)
    fr_out[:] = (rr * (ar + hr * br + hi * bi)).astype(fr_out.dtype)
    fi_out[:] = (rr * (ai + hr * bi - hi * br)).astype(fi_out.dtype)


def fft_h_combine2(rkr, rki, vr, vi, hr, hi, rr, h):
    """Forward H transforms of BOTH ADMM planes with the spectrum
    combine fused into one shared stage-2 kernel: two stage-A passes,
    then _h_passB_combine2_kernel — replaces fft_h(rk) + fft_h_combine
    and saves the rk spectrum's HBM round trip (4 plane passes)."""
    _, _, _, _, _, _, _, n1, n2 = _mats(h, False)
    w = vr.shape[-1]
    xa_r, xa_i = h_passA(rkr.reshape(n1, n2, w), rki.reshape(n1, n2, w),
                         h, False)
    ya_r, ya_i = h_passA(vr.reshape(n1, n2, w), vi.reshape(n1, n2, w),
                         h, False)
    bw = w if w % 128 else min(int(_os.environ.get("LPT_PALLAS_BW", "128")), w)
    kb = _pick_block(n1, int(_os.environ.get("LPT_PALLAS_KB") or _io_kb_default()))
    data_spec = pl.BlockSpec((kb, n2, bw), lambda i, k: (i, 0, k),
                             memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((n2, n2), lambda i, k: (0, 0),
                            memory_space=pltpu.VMEM)
    F2r, F2i = _mats(h, False)[2:4]
    shape = jax.ShapeDtypeStruct((n1, n2, w), _IO_DTYPE)
    fr, fi = pl.pallas_call(
        partial(_h_passB_combine2_kernel, n2),
        grid=(n1 // kb, w // bw),
        in_specs=[data_spec] * 7 + [mat_spec, mat_spec],
        out_specs=(data_spec, data_spec),
        out_shape=(shape, shape),
        interpret=_INTERPRET,
    )(xa_r, xa_i, ya_r, ya_i,
      hr.reshape(n1, n2, w), hi.reshape(n1, n2, w), rr.reshape(n1, n2, w),
      F2r, F2i)
    return fr.reshape(h, w), fi.reshape(h, w)


# ---------------------------------------------------------------------------
# dual-output inverse pass B: one spectrum read -> two filtered planes
# (ADMM needs image = inv(F_img) and forward_out = inv(H * F_img))
# ---------------------------------------------------------------------------


def _h_combine_dual_kernel(n2, xr_ref, xi_ref, yr_ref, yi_ref, hr_ref,
                           hi_ref, rr_ref, f2fr, f2fi, f2ir, f2ii,
                           a0r_ref, a0i_ref, a1r_ref, a1i_ref):
    """Forward stage-2 on both planes + spectrum combine + dual inverse
    stage-2, all in VMEM: the combined spectrum F = R(F2f^T x +
    conj(H) F2f^T y) and its H-filtered copy never cross HBM."""
    kb, _, bw = xr_ref.shape

    def stage2(vr, vi, mr, mi):
        # with LPT_KSTACK, mr/mi are the stacked ([F2 | -F2i], [F2i | F2])
        # (n2, 2n2) matrices and the contraction runs as a kb-BATCHED
        # left matmul (_dg_left): the output lands directly in the
        # (kb, n2, wv) block layout — the former swapaxes relayouts
        # (8 per grid step) disappear entirely.  With LPT_MM_FOLD, mr is
        # the (2n2, 2n2) M-stack of both and ONE batched matmul emits
        # the real/imag pair (mi unused — a pruned dummy ref).
        if _KSTACK:
            t = jnp.concatenate([vr, vi], axis=1)      # (kb, 2n2, wv)
            if _MM_FOLD:
                z = _dg_left(mr, t)                    # (kb, 2n2, wv)
                n2_ = z.shape[1] // 2
                return z[:, :n2_], z[:, n2_:]
            return _dg_left(mr, t), _dg_left(mi, t)
        # concat-free: mr/mi are the plain (n2, n2) stage matrices
        zr = _dg_left(mr, vr) - _dg_left(mi, vi)
        zi = _dg_left(mr, vi) + _dg_left(mi, vr)
        return zr, zi

    f32 = jnp.float32
    # stage-2 matmul inputs ride bf16 when _COMBINE_BF16_T (identical
    # numerics at Precision.DEFAULT, half the concat-temporary VMEM);
    # all elementwise combine math stays f32
    cdt = jnp.bfloat16 if _COMBINE_BF16_T else f32
    if _COMBINE_CF:
        # both forward stage-2 contractions as ONE double-width matmul
        # set (planes concatenated along lanes), ditto the two inverse
        # stage-2 contractions — 8 MXU ops per step instead of 16
        cr_, ci_ = stage2(
            jnp.concatenate([xr_ref[:].astype(cdt),
                             yr_ref[:].astype(cdt)], axis=2),
            jnp.concatenate([xi_ref[:].astype(cdt),
                             yi_ref[:].astype(cdt)], axis=2),
            f2fr[:], f2fi[:])
        ar, br = cr_[:, :, :bw], cr_[:, :, bw:]
        ai, bi = ci_[:, :, :bw], ci_[:, :, bw:]
    else:
        ar, ai = stage2(xr_ref[:].astype(cdt), xi_ref[:].astype(cdt),
                        f2fr[:], f2fi[:])
        br, bi = stage2(yr_ref[:].astype(cdt), yi_ref[:].astype(cdt),
                        f2fr[:], f2fi[:])
    hr = hr_ref[:].astype(f32)
    hi = hi_ref[:].astype(f32)
    rr = rr_ref[:].astype(f32)
    fr = rr * (ar + hr * br + hi * bi)
    fi = rr * (ai + hr * bi - hi * br)
    f1r = fr * hr - fi * hi
    f1i = fr * hi + fi * hr
    if _COMBINE_CF:
        gr_, gi_ = stage2(
            jnp.concatenate([fr.astype(cdt), f1r.astype(cdt)], axis=2),
            jnp.concatenate([fi.astype(cdt), f1i.astype(cdt)], axis=2),
            f2ir[:], f2ii[:])
        a0r, a1r = gr_[:, :, :bw], gr_[:, :, bw:]
        a0i, a1i = gi_[:, :, :bw], gi_[:, :, bw:]
    else:
        a0r, a0i = stage2(fr.astype(cdt), fi.astype(cdt),
                          f2ir[:], f2ii[:])
        a1r, a1i = stage2(f1r.astype(cdt), f1i.astype(cdt),
                          f2ir[:], f2ii[:])
    a0r_ref[:] = a0r.astype(a0r_ref.dtype)
    a0i_ref[:] = a0i.astype(a0i_ref.dtype)
    a1r_ref[:] = a1r.astype(a1r_ref.dtype)
    a1i_ref[:] = a1i.astype(a1i_ref.dtype)


def fft_h_combine_dual(rkr, rki, vr, vi, hr, hi, rr, h):
    """Forward H transforms of both ADMM planes, spectrum combine, AND
    the dual inverse inner contraction in one kernel chain: 2x forward
    pass-A, _h_combine_dual_kernel, then the two inverse pass-A calls
    happen in the caller.  Replaces fft_h_combine2 + h_passB_dual and
    keeps F (write+read) and the second H read out of HBM — 6 spectrum
    plane passes saved per iteration."""
    _, _, _, _, _, _, _, n1, n2 = _mats(h, False)
    w = vr.shape[-1]
    if _CONCAT_FUSE:
        (xa_r, xa_i), (ya_r, ya_i) = h_passA_pair(
            rkr.reshape(n1, n2, w), rki.reshape(n1, n2, w),
            vr.reshape(n1, n2, w), vi.reshape(n1, n2, w), h, False)
    else:
        xa_r, xa_i = h_passA(rkr.reshape(n1, n2, w), rki.reshape(n1, n2, w),
                             h, False)
        ya_r, ya_i = h_passA(vr.reshape(n1, n2, w), vi.reshape(n1, n2, w),
                             h, False)
    # the combine core's matmuls are kb-BATCHED (one per row block) —
    # trading kb for a wider lane block keeps VMEM constant while
    # folding row blocks into the matmul free dim (fewer, larger MXU
    # issues; the pipeline is issue-latency-bound at 12MP).
    # LPT_COMBINE_BW decouples this kernel's width from the pass-A
    # kernels (whose (n1, bj, bw) blocks explode at large bw).
    bw = w if w % 128 else min(
        int(_os.environ.get("LPT_COMBINE_BW")
            or _os.environ.get("LPT_PALLAS_BW", "128")), w)
    kb = _pick_block(n1, int(_os.environ.get("LPT_PALLAS_KB") or _io_kb_default()))
    data_spec = pl.BlockSpec((kb, n2, bw), lambda i, k: (i, 0, k),
                             memory_space=pltpu.VMEM)
    F2fr, F2fi = _mats(h, False)[2:4]
    F2ir, F2ii = _mats(h, True)[2:4]
    if _KSTACK:
        F2fr, F2fi = _stack_s1(F2fr, F2fi)
        F2ir, F2ii = _stack_s1(F2ir, F2ii)
        if _MM_FOLD:
            # M-stack the real/imag pair: ONE batched matmul per stage2
            # (see stage2's fold branch); the imag operands become
            # pruned dummies
            dummy = jnp.zeros((8, 128), F2fr.dtype)
            F2fr = jnp.concatenate([F2fr, F2fi], axis=0)
            F2ir = jnp.concatenate([F2ir, F2ii], axis=0)
            F2fi = F2ii = dummy
    mat_specs = [pl.BlockSpec(a.shape, lambda i, k: (0, 0),
                              memory_space=pltpu.VMEM)
                 for a in (F2fr, F2fi, F2ir, F2ii)]
    shape = jax.ShapeDtypeStruct((n1, n2, w), _IO_DTYPE)
    a0r, a0i, a1r, a1i = pl.pallas_call(
        partial(_h_combine_dual_kernel, n2),
        grid=(n1 // kb, w // bw),
        in_specs=[data_spec] * 7 + mat_specs,
        out_specs=(data_spec,) * 4,
        out_shape=(shape,) * 4,
        interpret=_INTERPRET,
    )(xa_r, xa_i, ya_r, ya_i,
      hr.reshape(n1, n2, w), hi.reshape(n1, n2, w), rr.reshape(n1, n2, w),
      F2fr, F2fi, F2ir, F2ii)
    # inverse pass-A (twiddle + outer contraction) on both planes
    if _CONCAT_FUSE:
        (z0r, z0i), (z1r, z1i) = h_passA_pair(a0r, a0i, a1r, a1i, h, True)
    else:
        z0r, z0i = h_passA(a0r, a0i, h, True)
        z1r, z1i = h_passA(a1r, a1i, h, True)
    return ((z0r.reshape(h, w), z0i.reshape(h, w)),
            (z1r.reshape(h, w), z1i.reshape(h, w)))


def _h_passB_dual_kernel(n2, yr_ref, yi_ref, hr_ref, hi_ref, f2r, f2i,
                         a0r_ref, a0i_ref, a1r_ref, a1i_ref):
    kb, _, bw = yr_ref.shape
    yr = yr_ref[:].astype(jnp.float32)
    yi = yi_ref[:].astype(jnp.float32)
    # plane 1 spectrum = H * y (fused multiply, one read of y)
    hr = hr_ref[:].astype(jnp.float32)
    hi = hi_ref[:].astype(jnp.float32)
    y1r = yr * hr - yi * hi
    y1i = yr * hi + yi * hr

    def contract(vr, vi):
        vr2 = jnp.swapaxes(vr, 0, 1).reshape(n2, kb * bw)
        vi2 = jnp.swapaxes(vi, 0, 1).reshape(n2, kb * bw)
        zr = _mm(f2r[:], vr2) - _mm(f2i[:], vi2)
        zi = _mm(f2r[:], vi2) + _mm(f2i[:], vr2)
        return (jnp.swapaxes(zr.reshape(n2, kb, bw), 0, 1),
                jnp.swapaxes(zi.reshape(n2, kb, bw), 0, 1))

    a0r, a0i = contract(yr, yi)
    a1r, a1i = contract(y1r, y1i)
    a0r_ref[:] = a0r.astype(a0r_ref.dtype)
    a0i_ref[:] = a0i.astype(a0i_ref.dtype)
    a1r_ref[:] = a1r.astype(a1r_ref.dtype)
    a1i_ref[:] = a1i.astype(a1i_ref.dtype)


def h_passB_dual(yr, yi, hr, hi, n, bw=None, kb=None):
    """Inverse inner contraction producing BOTH the unfiltered and the
    H-filtered planes from one read of the (split-order) spectrum."""
    F1r, F1i, F2r, F2i, Tr, Ti, scale, n1, n2 = _mats(n, True)
    _, _, w = yr.shape
    bw = bw or (w if w % 128 else min(int(_os.environ.get("LPT_PALLAS_BW", "128")), w))
    kb = kb or _pick_block(n1, int(_os.environ.get("LPT_PALLAS_KB") or _io_kb_default()))
    data_spec = pl.BlockSpec((kb, n2, bw), lambda i, k: (i, 0, k),
                             memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((n2, n2), lambda i, k: (0, 0),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((n1, n2, w), _IO_DTYPE)
    return pl.pallas_call(
        partial(_h_passB_dual_kernel, n2),
        grid=(n1 // kb, w // bw),
        in_specs=[data_spec] * 4 + [mat_spec, mat_spec],
        out_specs=(data_spec,) * 4,
        out_shape=(shape,) * 4,
        interpret=_INTERPRET,
    )(yr, yi, hr, hi, F2r, F2i)


# ---------------------------------------------------------------------------
# fused ADMM state kernels.  The entire per-iteration elementwise state
# update rides inside the two W-axis kernels, so state planes cross HBM
# once per iteration instead of once per XLA fusion pass:
#
#   E1 (pre-transform):  carried (image, fwd, xi, rho, eta, U) ->
#       deferred eta update, U/X/W updates, rk/v assembly, and the
#       forward W transform of BOTH rk and v — one kernel.
#       The TV finite differences need one halo row along H; the kernel
#       reads the image / eta0 / U0 planes through additional
#       block-shifted refs ((i±1) mod nb) and recomputes the one
#       overlap row instead of communicating across grid steps.
#   E2 (post-transform): inverse W transform of both spectra + the
#       xi/rho updates (row-local, no halos).
#
# Equivalence to the reference ordering (lensless/recon/admm.py update
# sequence): the eta update eta' = eta + mu2*(Psi x_new - u) needs the
# NEW image, so it is deferred to the next iteration's E1 (which holds
# image_new with halos); carrying u makes this exact, and iteration 0
# matches because all carried planes start at zero.
# ---------------------------------------------------------------------------


def _soft(x, thr):
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - thr, 0.0)


def _e_block_rows(m, w):
    """Row-block for the fused state kernels: ~30 block-sized buffers
    live in VMEM (in/out double buffering + TV intermediates).
    LPT_E_BLOCK overrides the target for tuning."""
    env = _os.environ.get("LPT_E_BLOCK")
    return _pick_block(m, int(env) if env else 8)


def _e1c_kernel(n1, n2, mu1, mu2, mu3, tau, c_in, c_out,
                imgp_ref, imgc_ref, imgn_ref, a0c_ref, a0n_ref, a1_ref,
                v_ref, b_ref, fwd_ref, mask_ref, dp_ref,
                f1r, f1i, f2r, f2i, trt, tit,
                rkr_ref, rki_ref, vr_ref, vi_ref,
                vo_ref, a0o_ref, a1o_ref, bo_ref):
    """Carry-rebuild ADMM pre-transform step.  The accumulating duals
    are never stored: with the deferred-eta scheme eta_eff = mu2*psi - a
    where a = mu2*u - eta_eff from the previous iteration, and likewise
    xi = mu1*fwd - v (v = mu1*X - xi) and rho = mu3*image - b
    (b = mu3*W - rho).  Carrying only {v, b, a0, a1} replaces the
    {xi, rho, eta0, eta1, u0, u1} planes and removes the whole e2 state
    update — one algebraic identity per dual, exactly equivalent."""
    f32 = jnp.float32
    img_c = imgc_ref[:].astype(f32)
    ximg = jnp.concatenate([imgp_ref[:].astype(f32)[-1:], img_c,
                            imgn_ref[:].astype(f32)[:1]], axis=0)
    psi0_ext = ximg[:-1] - ximg[1:]                       # rows [0, br]
    a0_ext = jnp.concatenate([a0c_ref[:], a0n_ref[:][:1]],
                             axis=0).astype(f32)
    eta0_eff = mu2 * psi0_ext - a0_ext
    thr = tau / mu2
    u0_new = _soft(psi0_ext + eta0_eff / mu2, thr)
    a0 = mu2 * u0_new - eta0_eff
    adj0 = a0[1:] - a0[:-1]
    a0o_ref[:] = a0[:-1].astype(a0o_ref.dtype)

    # W-axis TV: fully in-block periodic roll along natural lanes
    psi1 = jnp.concatenate([img_c[:, -1:], img_c[:, :-1]], axis=1) - img_c
    eta1_eff = mu2 * psi1 - a1_ref[:].astype(f32)
    u1_new = _soft(psi1 + eta1_eff / mu2, thr)
    a1 = mu2 * u1_new - eta1_eff
    adj1 = jnp.concatenate([a1[:, 1:], a1[:, :1]], axis=1) - a1
    a1o_ref[:] = a1.astype(a1o_ref.dtype)

    rho = mu3 * img_c - b_ref[:].astype(f32)
    W = jnp.maximum(rho / mu3 + img_c, 0.0)
    b = mu3 * W - rho
    bo_ref[:] = b.astype(bo_ref.dtype)
    rk = b + adj0 + adj1

    fwdv = fwd_ref[:].astype(f32)
    xi = mu1 * fwdv - _load_carry(v_ref[:], _v_scale(mu1))
    xdv = c_out + (c_in - c_out) * mask_ref[:].astype(f32)
    X = xdv * (xi + mu1 * fwdv + dp_ref[:].astype(f32))
    v = mu1 * X - xi
    _store_carry(vo_ref, v, _v_scale(mu1))

    mats = (f1r[:], f1i[:], f2r[:], f2i[:], trt[:], tit[:])
    if _CONCAT_FUSE:
        br = rk.shape[0]
        zr, zi = _w_fwd_core(jnp.concatenate([rk, v], axis=0), n1, n2, *mats)
        rkr_ref[:] = zr[:br].astype(rkr_ref.dtype)
        rki_ref[:] = zi[:br].astype(rki_ref.dtype)
        vr_ref[:] = zr[br:].astype(vr_ref.dtype)
        vi_ref[:] = zi[br:].astype(vi_ref.dtype)
        return
    zr, zi = _w_fwd_core(rk, n1, n2, *mats)
    rkr_ref[:] = zr.astype(rkr_ref.dtype)
    rki_ref[:] = zi.astype(rki_ref.dtype)
    zr, zi = _w_fwd_core(v, n1, n2, *mats)
    vr_ref[:] = zr.astype(vr_ref.dtype)
    vi_ref[:] = zi.astype(vi_ref.dtype)


def _w_inv_dual_kernel(n1, n2, scale,
                       a0r_ref, a0i_ref, a1r_ref, a1i_ref,
                       f1r, f1i, f2r, f2i, trt, tit, img_ref, fwd_ref):
    f32 = jnp.float32
    mats = (f1r[:], f1i[:], f2r[:], f2i[:], trt[:], tit[:])
    if _CONCAT_FUSE:
        br = a0r_ref.shape[0]
        zr = jnp.concatenate([a0r_ref[:].astype(f32),
                              a1r_ref[:].astype(f32)], axis=0)
        zi = jnp.concatenate([a0i_ref[:].astype(f32),
                              a1i_ref[:].astype(f32)], axis=0)
        out = _w_inv_core(zr, zi, n1, n2, scale, *mats)
        img_ref[:] = out[:br].astype(img_ref.dtype)
        fwd_ref[:] = out[br:].astype(fwd_ref.dtype)
        return
    image = _w_inv_core(a0r_ref[:].astype(f32), a0i_ref[:].astype(f32),
                        n1, n2, scale, *mats)
    fwd = _w_inv_core(a1r_ref[:].astype(f32), a1i_ref[:].astype(f32),
                      n1, n2, scale, *mats)
    img_ref[:] = image.astype(img_ref.dtype)
    fwd_ref[:] = fwd.astype(fwd_ref.dtype)


def e1_carry(image, fwd, v, b, a0, a1, mask, dp,
             mu1, mu2, mu3, tau, block_rows=None):
    """Carry-rebuild pre-transform step (see _e1c_kernel).  Returns
    (rk_wr, rk_wi, v_wr, v_wi, v', a0', a1', b')."""
    m, w = fwd.shape
    br = block_rows or _e_block_rows(m, w)
    nb = m // br
    F1r_np, F1i_np, F2r_np, F2i_np, Tr_np, Ti_np, scale, n1, n2 = _plan(w, False)
    mats = (jnp.asarray(F1r_np), jnp.asarray(F1i_np), jnp.asarray(F2r_np),
            jnp.asarray(F2i_np), jnp.asarray(np.ascontiguousarray(Tr_np.T)),
            jnp.asarray(np.ascontiguousarray(Ti_np.T)))
    spec_c = pl.BlockSpec((br, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_p = pl.BlockSpec((br, w), lambda i: ((i - 1) % nb, 0),
                          memory_space=pltpu.VMEM)
    spec_n = pl.BlockSpec((br, w), lambda i: ((i + 1) % nb, 0),
                          memory_space=pltpu.VMEM)
    m1 = pl.BlockSpec((n1, n1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    m2 = pl.BlockSpec((n2, n2), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mt = pl.BlockSpec((n2, n1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    io_sh = jax.ShapeDtypeStruct((m, w), _IO_DTYPE)
    cr_sh = jax.ShapeDtypeStruct((m, w), _CARRY_DTYPE)
    cr_v = jax.ShapeDtypeStruct((m, w), _CARRY_V_DTYPE)
    c_in = 1.0 / (1.0 + mu1)
    c_out = 1.0 / mu1
    return pl.pallas_call(
        partial(_e1c_kernel, n1, n2, mu1, mu2, mu3, tau, c_in, c_out),
        grid=(nb,),
        in_specs=[spec_p, spec_c, spec_n,          # image halo refs
                  spec_c, spec_n,                  # a0
                  spec_c,                          # a1
                  spec_c, spec_c, spec_c,          # v, b, fwd
                  spec_c, spec_c,                  # mask, dp
                  m1, m1, m2, m2, mt, mt],
        out_specs=(spec_c,) * 8,
        out_shape=(io_sh, io_sh, io_sh, io_sh,     # rk/v W-spectra
                   cr_v,                           # v'
                   cr_sh, cr_sh, cr_sh),           # a0', a1', b'
        interpret=_INTERPRET,
    )(image, image, image, a0, a0, a1, v, b, fwd, mask, dp, *mats)


def ifft_w_dual(a0r, a0i, a1r, a1i, block_rows=None):
    """(image, forward) = (ifft_w(A0), ifft_w(A1)) in one kernel —
    the whole post-transform step of the carry-rebuild pipeline."""
    m, w = a0r.shape
    br = block_rows or _e_block_rows(m, w)
    nb = m // br
    F1r_np, F1i_np, F2r_np, F2i_np, Tr_np, Ti_np, scale, n1, n2 = _plan(w, True)
    mats = (jnp.asarray(F1r_np), jnp.asarray(F1i_np), jnp.asarray(F2r_np),
            jnp.asarray(F2i_np), jnp.asarray(np.ascontiguousarray(Tr_np.T)),
            jnp.asarray(np.ascontiguousarray(Ti_np.T)))
    spec_c = pl.BlockSpec((br, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    m1 = pl.BlockSpec((n1, n1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    m2 = pl.BlockSpec((n2, n2), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mt = pl.BlockSpec((n2, n1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    io_sh = jax.ShapeDtypeStruct((m, w), _IO_DTYPE)
    return pl.pallas_call(
        partial(_w_inv_dual_kernel, n1, n2, scale),
        grid=(nb,),
        in_specs=[spec_c] * 4 + [m1, m1, m2, m2, mt, mt],
        out_specs=(spec_c, spec_c),
        out_shape=(io_sh, io_sh),
        interpret=_INTERPRET,
    )(a0r, a0i, a1r, a1i, *mats)


# ---------------------------------------------------------------------------
# real-input half-spectrum W transforms (rfft packing).
#
# Spatial rows live in the even/odd SPLIT LANE LAYOUT [x[0::2] | x[1::2]]
# (ops/pallas_fft.py rfft section), so the packing p = evens + i*odds is
# two contiguous lane slices.  One size-M = N/2 complex two-stage
# transform + a mirror-permutation unpack produces the half-spectrum —
# HALVING all downstream spectrum traffic, filter storage, and H-axis
# kernel grids.  The mirror (k -> (M - k) mod M in split order) is three
# small permutation matmuls (J1 row perm, J2a/J2b lane perms) — MXU work,
# no lane shuffles.  Z[M] (real Nyquist) rides in Im of the DC lane;
# the solver patches that one column exactly (recon/admm_split.py).
# ---------------------------------------------------------------------------


_N_RMATS = 51  # 30 base + 14 K-stacked + 7 M-fold double-stacked operands

_KSTACK = _os.environ.get("LPT_KSTACK", "1") != "0"
# finer knobs: the K-stack concats are VPU copies; in the INVERSE core
# the non-stacked path is already layout-clean, so its stacking can be
# net-negative — separately toggleable for measurement
_KSTACK_INV = _KSTACK and _os.environ.get("LPT_KSTACK_INV", "1") != "0"
_DUAL_CONCAT = _os.environ.get("LPT_DUAL_CONCAT", "1") != "0"
# combine-kernel-only concat fusion: with LPT_MM_FOLD the fused double-
# width stage2 saves only 1 matmul per call, while its (kb, 2n2, 2bw)
# f32 temporaries dominate the kernel's scoped VMEM (the 0.84 MB that
# blocks KB=16, NOTES.md round-3).  LPT_COMBINE_CF=0 processes the two
# planes separately — half-width temporaries, one extra matmul.
_COMBINE_CF = (_os.environ.get("LPT_COMBINE_CF", "").lower() or
               ("1" if _CONCAT_FUSE else "0")) != "0"
# bf16 stage-2 matmul INPUTS in the combine kernel: at Precision.DEFAULT
# the MXU truncates f32 operands to bf16 anyway, so pre-casting the
# concat temporaries is numerically identical on-chip while halving the
# kernel's dominant scoped-VMEM temporaries (the KB=16 blocker).
# Forced off at HIGHEST precision (there it WOULD change numerics).
_COMBINE_BF16_T = (_PREC == jax.lax.Precision.DEFAULT and
                   _os.environ.get("LPT_COMBINE_BF16_T", "1") != "0")

# same trick for the W cores / pass-A kernels — default OFF: unlike the
# combine kernel (whose inputs are ALREADY bf16 refs, so the cast
# REMOVES an astype pass: 2.05 -> 1.79 ms/call), the W cores' stage
# inputs are fresh f32 compute results, and the added cast pass
# measured e1_rtv 1.12 -> 2.52 ms/call on-chip.  Knob kept for
# experiments on other grids.
_BF16_T = (_PREC == jax.lax.Precision.DEFAULT and
           _os.environ.get("LPT_BF16_T", "0") != "0")


def _tdt():
    """Stage-matmul input dtype (see _BF16_T)."""
    return jnp.bfloat16 if _BF16_T else jnp.float32


def _as_t(x):
    return x if x.dtype == _tdt() else x.astype(_tdt())


def _rplan_mats(n_full, inverse):
    """Constant operand stack for the packed-real kernels (jnp arrays).

    Both cores need the mirror R(P) = P[(M-k) mod M], which factorizes
    as a k1 (row) permutation J1 and a k2 (lane) permutation J2b (J2a on
    the k1 = 0 row).  All permutations are folded into host-precomputed
    operands so neither core performs an in-kernel transpose/relayout:

    * forward (_w_rfwd_core): k1 perm as a lane matmul on the stage-1
      output, k2 perm premultiplied into stage-2 (F2 @ J2b / F2 @ J2a).
    * inverse (_w_rinv_core): the unpack algebra is rewritten as
      P = alpha.Z + beta.conj(R(Z)) with position fields alpha/beta,
      and C(R(W)) folds the permutations into row-permuted stage
      matrices (J2b @ F2 / J2a @ F2 for stage B, T[sigma1(k)] twiddle,
      F1 @ J1 for stage C) — see _w_rinv_core.
    """
    from .pallas_fft import _rplan

    m = n_full // 2
    F1r, F1i, F2r, F2i, Tr, Ti, scale, n1, n2 = _plan(m, inverse)
    J1, J2a, J2b, Er, Ei, Wr, Wi, mask00, _, _ = _rplan(n_full)
    tw_r, tw_i = (Wr, Wi) if inverse else (Er, Ei)

    # inverse-fold fields (used only by the inverse core; computed for
    # both plans — cheap, keeps one tuple layout)
    w = Wr + 1j * Wi if inverse else Er + 1j * Ei  # unpack twiddle field
    alpha = 0.5 * ((1.0 - w.imag) + 1j * w.real)
    beta = 0.5 * ((1.0 + w.imag) - 1j * w.real)
    # packed DC position stores (Z[0], Z[M]): P(0,0) = 0.5(1+i) conj-side
    alpha[0, 0] = 0.0
    beta[0, 0] = 0.5 + 0.5j
    # beta composed with the mirror permutation (numpy ground truth)
    k1g, k2g = np.meshgrid(np.arange(n1), np.arange(n2), indexing="ij")
    s1 = (-k1g) % n1
    s2 = np.where(k1g == 0, (-k2g) % n2, n2 - 1 - k2g)
    beta_s = beta[s1, s2]
    TrT = np.ascontiguousarray(Tr.T)  # (n1, n2) [k1, j2]
    TiT = np.ascontiguousarray(Ti.T)
    mats = (F1r, F1i, F2r, F2i, TrT, TiT,
            J1, J2a, J2b, tw_r, tw_i, mask00,
            # forward-fold stage-2 (column-permuted)
            np.ascontiguousarray(F2r @ J2b), np.ascontiguousarray(F2i @ J2b),
            np.ascontiguousarray(F2r @ J2a), np.ascontiguousarray(F2i @ J2a),
            # inverse-fold operands
            np.ascontiguousarray(alpha.real.astype(np.float32)),
            np.ascontiguousarray(alpha.imag.astype(np.float32)),
            np.ascontiguousarray(beta_s.real.astype(np.float32)),
            np.ascontiguousarray(beta_s.imag.astype(np.float32)),
            np.ascontiguousarray(J2b @ F2r), np.ascontiguousarray(J2b @ F2i),
            np.ascontiguousarray(J2a @ F2r), np.ascontiguousarray(J2a @ F2i),
            np.ascontiguousarray(F1r @ J1), np.ascontiguousarray(F1i @ J1),
            # twiddle as (n1, n2) [k1, j2] + its sigma1-row-permuted copy
            np.ascontiguousarray(Tr), np.ascontiguousarray(Ti),
            np.ascontiguousarray(Tr[(-np.arange(n1)) % n1]),
            np.ascontiguousarray(Ti[(-np.arange(n1)) % n1]))

    # K-stacked complex-matmul operands (LPT_KSTACK): every complex
    # contraction A@x - B@y / B@x + A@y runs as ONE real matmul per
    # output against [x; y] stacked along the contracted axis — the MXU
    # instruction count of both cores roughly halves (the pipeline is
    # issue-latency-bound at 12MP, not FLOPs-bound).
    f2rb, f2ib = mats[12], mats[13]
    f2ra, f2ia = mats[14], mats[15]
    f2sbr, f2sbi = mats[20], mats[21]
    f2sar, f2sai = mats[22], mats[23]
    f1sr, f1si = mats[24], mats[25]

    def cc(parts, axis):
        return np.ascontiguousarray(np.concatenate(parts, axis=axis))

    stacked = (
        cc([F1r, -F1i], 1), cc([F1i, F1r], 1),            # fwd stage 1
        cc([F2r, -F2i], 0), cc([F2i, F2r], 0),            # stage 2 / A-chain
        cc([f2rb, -f2ib], 0), cc([f2ib, f2rb], 0),        # fwd mirror
        cc([f2ra, -f2ia], 0), cc([f2ia, f2ra], 0),        # fwd k1=0 row
        cc([f2sbr, -f2sbi], 0), cc([f2sbi, f2sbr], 0),    # inv R(W)-chain
        cc([f2sar, -f2sai], 0), cc([f2sai, f2sar], 0),    # inv k1=0 row
        cc([F1r, -F1i, f1sr, -f1si], 1),                  # inv final (pr)
        cc([F1i, F1r, f1si, f1sr], 1),                    # inv final (pi)
    )
    # M-fold double-stacks (LPT_MM_FOLD): real/imag matmul pairs sharing
    # an operand merge into ONE matmul — left (M-dim) stacks for the
    # _dg_left sublane contractions, lane (N-dim) stacks for the _dgB2
    # folded lane contractions.  Outputs split at free 8-sublane /
    # 128-lane boundaries.
    fold = (
        cc([stacked[0], stacked[1]], 0),    # 44 fwd stage 1 (2n1, 2n1)
        cc([stacked[2], stacked[3]], 1),    # 45 stage2/A-chain (2n2, 2n2)
        cc([stacked[4], stacked[5]], 1),    # 46 fwd mirror
        cc([stacked[6], stacked[7]], 1),    # 47 fwd k1=0 row
        cc([stacked[8], stacked[9]], 1),    # 48 inv R(W)-chain
        cc([stacked[10], stacked[11]], 1),  # 49 inv k1=0 row
        cc([stacked[12], stacked[13]], 0),  # 50 inv final (2n1, 4n1)
    )
    mats = mats + stacked + fold
    assert len(mats) == _N_RMATS
    # matmul-operand indices ride the (optional) bf16 storage; twiddle/
    # unpack/mask fields are elementwise VPU operands and stay f32
    matmul_idx = frozenset(
        {0, 1, 2, 3, 6, 12, 13, 14, 15, 20, 21, 22, 23, 24, 25}
        | set(range(30, 51)))
    mm = _mat_dtype()
    return (tuple(jnp.asarray(a, mm if i in matmul_idx else None)
                  for i, a in enumerate(mats)),
            float(scale), n1, n2)


def _w_rfwd_core(x2d, n1, n2, mats, fold=None):
    """(br, N) split-layout real rows -> half-spectrum (br, M) pair.

    The mirror P_rev = P[(M-k) mod M] is computed WITHOUT permuting P:
    the k1 row permutation becomes a lane matmul on the stage-1 output t
    (t2 = t . J1, k1 is t's lane axis) and the k2 lane permutation is
    premultiplied into stage-2 (F2?b, F2?a for the special k1 = 0 row) —
    no in-kernel transpose/relayout (round-1 _mirror_core did both).
    (The j2-major lane-layout variant was removed — Mosaic-illegal below
    W = 16384, see NOTES.md round-2 post-mortem.)"""
    (f1r, f1i, f2r, f2i, trt, tit, j1m, j2a, j2b, er, ei, mask00,
     f2rb, f2ib, f2ra, f2ia) = mats[:16]
    br = x2d.shape[0]
    m = n1 * n2
    pr = x2d[:, :m].reshape(br, n1, n2)
    pi = x2d[:, m:].reshape(br, n1, n2)

    if _KSTACK and n1 > 1:
        # K-stacked LEFT-BATCHED path: each complex contraction pair is
        # ONE matmul against [re; im] stacked along the contracted axis,
        # and every stage runs as a kb-batched left matmul so ALL
        # intermediates keep the 128-wide n2/k2 axis MINOR — the dgA
        # form's (br, j2, k1) intermediates put the 32-wide k1 digit on
        # the lanes and forced implicit Mosaic relayouts between stages.
        (syr, syi, spr, spi, srr, sri, sr0r, sr0i) = mats[30:38]
        twr_n, twi_n = mats[26], mats[27]              # (k1, j2) natural
        P = jnp.concatenate([_as_t(pr), _as_t(pi)], axis=1)  # (br, 2n1, n2)
        if fold if fold is not None else _MM_FOLD:
            # M-fold: yr/yi in ONE batched matmul (M = 2n1), every lane
            # contraction as ONE flattened (br*n1, 2n2) matmul with the
            # real/imag outputs lane-stacked (see _dgB2 / fold operands)
            Y = _dg_left(mats[44], P)                  # (br, 2n1, j2)
            yr, yi = Y[:, :n1], Y[:, n1:]
            tr = yr * twr_n - yi * twi_n
            ti = yr * twi_n + yi * twr_n
            T = jnp.concatenate([_as_t(tr), _as_t(ti)], axis=2)  # (br, k1, 2j2)
            PP = _dgB2(T, mats[45])                    # (br, k1, 2k2)
            Pr, Pi = PP[..., :n2], PP[..., n2:]
            T2 = _dg_left(j1m, T)                      # k1 -> sigma1(k1)
            RB = _dgB2(T2, mats[46])
            Rr_b, Ri_b = RB[..., :n2], RB[..., n2:]
            R0 = _dgB2(T[:, :1, :], mats[47])
            R0r, R0i = R0[..., :n2], R0[..., n2:]
        else:
            yr = _dg_left(syr, P)                      # (br, k1, j2)
            yi = _dg_left(syi, P)
            tr = yr * twr_n - yi * twi_n
            ti = yr * twi_n + yi * twr_n
            T = jnp.concatenate([_as_t(tr), _as_t(ti)], axis=2)  # (br, k1, 2j2)

            def dg2(v, mat):                           # contract 2j2
                return jax.lax.dot_general(
                    v, mat, (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_PREC)

            Pr = dg2(T, spr)                           # (br, k1, k2)
            Pi = dg2(T, spi)
            T2 = _dg_left(j1m, T)                      # k1 -> sigma1(k1)
            Rr_b = dg2(T2, srr)
            Ri_b = dg2(T2, sri)
            t0 = T[:, :1, :]
            R0r = dg2(t0, sr0r)
            R0i = dg2(t0, sr0i)
        Rr = jnp.concatenate([R0r, Rr_b[:, 1:, :]], axis=1)
        Ri = jnp.concatenate([R0i, Ri_b[:, 1:, :]], axis=1)
        Sr, Si = Pr + Rr, Pi - Ri
        Dr, Di = Pr - Rr, Pi + Ri
        Zr = 0.5 * (Sr + er * Di + ei * Dr)
        Zi = 0.5 * (Si - (er * Dr - ei * Di))
        Zi = jnp.where(mask00 > 0, Pr - Pi, Zi)
        return Zr.reshape(br, m), Zi.reshape(br, m)

    # left-batched concat-free path (LPT_KSTACK=0): same 128-minor
    # layouts as the K-stacked branch but twice the matmuls and ZERO
    # concat copies — on this TPU the per-step VPU copies of the
    # stacked operands can outweigh the matmul savings
    twr_n, twi_n = mats[26], mats[27]              # (k1, j2) natural

    def dg2(v, mat):                               # contract j2 digit
        return jax.lax.dot_general(v, mat, (((2,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=_PREC)

    yr = _dg_left(f1r, pr) - _dg_left(f1i, pi)     # (br, k1, j2)
    yi = _dg_left(f1i, pr) + _dg_left(f1r, pi)
    tr = yr * twr_n - yi * twi_n
    ti = yr * twi_n + yi * twr_n

    Pr = dg2(tr, f2r) - dg2(ti, f2i)               # (br, k1, k2)
    Pi = dg2(tr, f2i) + dg2(ti, f2r)
    if n1 == 1:                                    # degenerate: only row 0
        Rr = dg2(tr, f2ra) - dg2(ti, f2ia)
        Ri = dg2(tr, f2ia) + dg2(ti, f2ra)
    else:
        t2r = _dg_left(j1m, tr)                    # k1 -> sigma1(k1)
        t2i = _dg_left(j1m, ti)
        Rr_b = dg2(t2r, f2rb) - dg2(t2i, f2ib)
        Ri_b = dg2(t2r, f2ib) + dg2(t2i, f2rb)
        # row k1 = 0 (self-mirrored) uses the J2a lane permutation;
        # sigma1(0) = 0 so it reads t's own row 0
        t0r, t0i = tr[:, :1, :], ti[:, :1, :]
        R0r = dg2(t0r, f2ra) - dg2(t0i, f2ia)
        R0i = dg2(t0r, f2ia) + dg2(t0i, f2ra)
        Rr = jnp.concatenate([R0r, Rr_b[:, 1:, :]], axis=1)
        Ri = jnp.concatenate([R0i, Ri_b[:, 1:, :]], axis=1)
    Sr, Si = Pr + Rr, Pi - Ri
    Dr, Di = Pr - Rr, Pi + Ri
    Zr = 0.5 * (Sr + er * Di + ei * Dr)
    Zi = 0.5 * (Si - (er * Dr - ei * Di))
    Zi = jnp.where(mask00 > 0, Pr - Pi, Zi)    # pack Z[M] into Im(DC)
    return Zr.reshape(br, m), Zi.reshape(br, m)


def _w_rinv_core(zr2d, zi2d, n1, n2, scale, mats):
    """(br, M) half-spectrum pair -> (br, N) split-layout real rows.

    Permutation-free unpack: the even/odd reconstruction is algebra-
    identical to P = alpha.Z + beta.conj(R(Z)) with position fields
    alpha/beta (the packed-DC position folded into the fields), and the
    mirrored term routes through contraction stages with PERMUTED
    matrices: C(R(W)) = dgC(dgB(W, J2b@F2) . T[sigma1], F1@J1) with a
    thin J2a@F2 splice for the self-mirrored k1 = 0 row — no in-kernel
    transpose, concat on one row only, no where-masks."""
    (f1r, f1i, f2r, f2i) = mats[:4]
    (alr, ali, bsr, bsi, f2sbr, f2sbi, f2sar, f2sai,
     f1sr, f1si, twr, twi, tsr, tsi) = mats[16:30]
    br = zr2d.shape[0]
    m = n1 * n2
    Z3r = zr2d.reshape(br, n1, n2)
    Z3i = zi2d.reshape(br, n1, n2)
    # A-part: alpha . Z ; W = (beta o sigma) . conj(Z)
    Par = alr * Z3r - ali * Z3i
    Pai = ali * Z3r + alr * Z3i
    Wr_ = bsr * Z3r + bsi * Z3i          # conj(Z): imag negated
    Wi_ = bsi * Z3r - bsr * Z3i

    def dgB(v, mat):                           # contract k2
        return jax.lax.dot_general(v, mat, (((2,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=_PREC)

    def dgC(v, mat):                           # contract k1 -> (br, j2, j1)
        return jax.lax.dot_general(v, mat, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=_PREC)

    if _KSTACK_INV and _BATCHED_DG:
        # K-stacked path: one matmul per complex contraction output
        # (see _rplan_mats) — 8 MXU ops instead of 20
        spr, spi = mats[32], mats[33]
        sgr, sgi = mats[38], mats[39]
        sg0r, sg0i = mats[40], mats[41]
        sfr, sfi = mats[42], mats[43]
        PA = jnp.concatenate([_as_t(Par), _as_t(Pai)], axis=2)  # (br, n1, 2n2)
        if _MM_FOLD_INV:
            # M-fold: lane contractions as single flattened matmuls with
            # real/imag lane-stacked, final stage as ONE batched matmul
            # producing BOTH output planes (M = 2n1)
            AA = _dgB2(PA, mats[45])                   # (br, k1, 2j2)
            ar, ai = AA[..., :n2], AA[..., n2:]
        else:
            ar = dgB(PA, spr)                          # (br, k1, j2)
            ai = dgB(PA, spi)
        tr_ = ar * twr - ai * twi
        ti_ = ar * twi + ai * twr
        W = jnp.concatenate([_as_t(Wr_), _as_t(Wi_)], axis=2)
        if _MM_FOLD_INV:
            if n1 > 1:
                GG = _dgB2(W, mats[48])
                G0 = _dgB2(W[:, :1, :], mats[49])
                GG = jnp.concatenate([G0, GG[:, 1:, :]], axis=1)
            else:
                GG = _dgB2(W, mats[49])
            gr, gi = GG[..., :n2], GG[..., n2:]
        elif n1 > 1:
            gr = dgB(W, sgr)
            gi = dgB(W, sgi)
            w0 = W[:, :1, :]
            g0r = dgB(w0, sg0r)
            g0i = dgB(w0, sg0i)
            gr = jnp.concatenate([g0r, gr[:, 1:, :]], axis=1)
            gi = jnp.concatenate([g0i, gi[:, 1:, :]], axis=1)
        else:
            gr = dgB(W, sg0r)
            gi = dgB(W, sg0i)
        hr = gr * tsr - gi * tsi
        hi = gr * tsi + gi * tsr
        # final: all four terms of each output in ONE batched matmul
        # (K = 4*n1, the full 128-lane MXU contraction at 12MP)
        T4 = jnp.concatenate([_as_t(tr_), _as_t(ti_), _as_t(hr),
                              _as_t(hi)], axis=1)      # (br, 4n1, j2)
        if _MM_FOLD_INV_FINAL:
            PP = _dg_left(mats[50], T4)                # (br, 2n1, j2)
            pr_ = PP[:, :n1] * scale
            pi_ = PP[:, n1:] * scale
        else:
            pr_ = _dg_left(sfr, T4) * scale
            pi_ = _dg_left(sfi, T4) * scale
        return jnp.concatenate([pr_.reshape(br, m), pi_.reshape(br, m)],
                               axis=1)

    # A-chain: standard stages
    ar = dgB(Par, f2r) - dgB(Pai, f2i)         # (br, k1, j2)
    ai = dgB(Par, f2i) + dgB(Pai, f2r)
    tr_ = ar * twr - ai * twi                  # twr/twi are (n1, n2) [k1, j2]
    ti_ = ar * twi + ai * twr

    # R(W)-chain: row-permuted stage matrices
    gr = dgB(Wr_, f2sbr) - dgB(Wi_, f2sbi)     # (br, k, j2)
    gi = dgB(Wr_, f2sbi) + dgB(Wi_, f2sbr)
    if n1 > 1:
        w0r, w0i = Wr_[:, :1, :], Wi_[:, :1, :]
        g0r = dgB(w0r, f2sar) - dgB(w0i, f2sai)
        g0i = dgB(w0r, f2sai) + dgB(w0i, f2sar)
        gr = jnp.concatenate([g0r, gr[:, 1:, :]], axis=1)
        gi = jnp.concatenate([g0i, gi[:, 1:, :]], axis=1)
    else:
        gr = dgB(Wr_, f2sar) - dgB(Wi_, f2sai)
        gi = dgB(Wr_, f2sai) + dgB(Wi_, f2sar)
    hr = gr * tsr - gi * tsi                   # twiddle at sigma1(k)
    hi = gr * tsi + gi * tsr

    if _BATCHED_DG:
        # final contraction as batched left-matmuls: natural (br, j1, j2)
        # output order, no trailing minor-dim transpose.  dgC contracts
        # f1 dim 1, so the left operand is the matrix itself (f1[j1, k1]).
        pr_ = (_dg_left(f1r, tr_) - _dg_left(f1i, ti_)
               + _dg_left(f1sr, hr) - _dg_left(f1si, hi))
        pi_ = (_dg_left(f1i, tr_) + _dg_left(f1r, ti_)
               + _dg_left(f1si, hr) + _dg_left(f1sr, hi))
    else:
        pr_ = (dgC(tr_, f1r) - dgC(ti_, f1i)
               + dgC(hr, f1sr) - dgC(hi, f1si))
        pi_ = (dgC(tr_, f1i) + dgC(ti_, f1r)
               + dgC(hr, f1si) + dgC(hi, f1sr))
        pr_ = jnp.swapaxes(pr_, 1, 2)
        pi_ = jnp.swapaxes(pi_, 1, 2)
    pr_ = pr_ * scale
    pi_ = pi_ * scale
    return jnp.concatenate([pr_.reshape(br, m), pi_.reshape(br, m)], axis=1)


def _w_rfwd_kernel(n1, n2, x_ref, *refs):
    mats = tuple(r[:] for r in refs[:_N_RMATS])
    or_ref, oi_ref = refs[_N_RMATS], refs[_N_RMATS + 1]
    zr, zi = _w_rfwd_core(x_ref[:].astype(jnp.float32), n1, n2, mats)
    or_ref[:] = zr.astype(or_ref.dtype)
    oi_ref[:] = zi.astype(oi_ref.dtype)


def _w_rinv_kernel(n1, n2, scale, zr_ref, zi_ref, *refs):
    mats = tuple(r[:] for r in refs[:_N_RMATS])
    out_ref = refs[_N_RMATS]
    out = _w_rinv_core(zr_ref[:].astype(jnp.float32),
                       zi_ref[:].astype(jnp.float32), n1, n2, scale, mats)
    out_ref[:] = out.astype(out_ref.dtype)


def _const_specs(mats):
    return [pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for a in mats]


def _prune_mats(mats, core, n1=2, fold=None):
    """Replace _rplan_mats entries the given core variant never touches
    with tiny dummies.  Every _const_specs operand occupies a VMEM
    block whether or not the kernel reads it, and under the KSTACK
    defaults roughly half of each 44-operand stack is dead (~1 MB/stack
    at 12MP after bf16 mats) — pruning frees it for bigger row blocks.
    Positional indexing in the cores is preserved (dummy refs are
    simply never read)."""
    if core == "rfwd":
        # the K-stacked branch also requires n1 > 1 (trace-time check in
        # _w_rfwd_core); degenerate grids take the plain path
        if _KSTACK and n1 > 1:
            f = _MM_FOLD if fold is None else fold
            used = ({6, 9, 10, 11, 26, 27, 44, 45, 46, 47} if f
                    else {6, 9, 10, 11, 26, 27} | set(range(30, 38)))
        else:
            used = {0, 1, 2, 3, 6, 9, 10, 11, 12, 13, 14, 15, 26, 27}
    else:  # "rinv"
        if _KSTACK_INV and _BATCHED_DG:
            used = {16, 17, 18, 19, 26, 27, 28, 29}
            used |= ({45, 48, 49} if _MM_FOLD_INV
                     else {32, 33, 38, 39, 40, 41})
            used |= ({50} if _MM_FOLD_INV_FINAL else {42, 43})
        else:
            used = {0, 1, 2, 3} | set(range(16, 30))
    dummy = jnp.zeros((8, 128), jnp.float32)
    return tuple(m if i in used else dummy for i, m in enumerate(mats))


def rfft_w(x, block_rows=None):
    """(m, N) split-layout real rows -> half-spectrum (m, N/2) r/i pair."""
    m_rows, n_full = x.shape
    mh = n_full // 2
    block_rows = block_rows or _w_block_rows(m_rows, n_full)
    mats, scale, n1, n2 = _rplan_mats(n_full, False)
    mats = _prune_mats(mats, "rfwd", n1)
    in_spec = pl.BlockSpec((block_rows, n_full), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((block_rows, mh), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_w_rfwd_kernel, n1, n2),
        grid=(m_rows // block_rows,),
        in_specs=[in_spec] + _const_specs(mats),
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((m_rows, mh), _IO_DTYPE),) * 2,
        interpret=_INTERPRET,
    )(x, *mats)


def irfft_w(zr, zi, block_rows=None, out_dtype=jnp.float32):
    """(m, N/2) half-spectrum pair -> (m, N) split-layout real rows."""
    m_rows, mh = zr.shape
    n_full = 2 * mh
    block_rows = block_rows or _w_block_rows(m_rows, n_full)
    mats, scale, n1, n2 = _rplan_mats(n_full, True)
    mats = _prune_mats(mats, "rinv", n1)
    spec_half = pl.BlockSpec((block_rows, mh), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    spec_full = pl.BlockSpec((block_rows, n_full), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_w_rinv_kernel, n1, n2, scale),
        grid=(m_rows // block_rows,),
        in_specs=[spec_half, spec_half] + _const_specs(mats),
        out_specs=spec_full,
        out_shape=jax.ShapeDtypeStruct((m_rows, n_full), out_dtype),
        interpret=_INTERPRET,
    )(zr, zi, *mats)


# ---------------------------------------------------------------------------
# fused ADMM state kernels, half-spectrum variant.  Same state algebra
# as _e1_kernel/_e2_kernel (module comment above) with two changes:
# spatial planes are stored in the even/odd split lane layout, so the
# W-axis TV rolls act on the two halves, and the in-kernel W transforms
# are the packed-real half-spectrum cores — the rk/v spectra leave the
# kernel at HALF width.
# ---------------------------------------------------------------------------


def _split_roll_p1(x, mh):
    """roll(x, +1) along natural W, even/odd split lane layout:
    new_even[j] = old[2j-1] = odd[j-1], new_odd[j] = old[2j] = even[j]."""
    ev, od = x[:, :mh], x[:, mh:]
    od_r = jnp.concatenate([od[:, -1:], od[:, :-1]], axis=1)
    return jnp.concatenate([od_r, ev], axis=1)


def _split_roll_m1(x, mh):
    """roll(x, -1) along natural W, even/odd split lane layout:
    new_even[j] = old[2j+1] = odd[j], new_odd[j] = old[2j+2] = even[j+1]."""
    ev, od = x[:, :mh], x[:, mh:]
    ev_r = jnp.concatenate([ev[:, 1:], ev[:, :1]], axis=1)
    return jnp.concatenate([od, ev_r], axis=1)


def _e1cr_kernel(n1, n2, mh, mu1, mu2, mu3, tau, c_in, c_out,
                 imgp_ref, imgc_ref, imgn_ref, a0c_ref, a0n_ref, a1_ref,
                 v_ref, b_ref, fwd_ref, mask_ref, dp_ref, *refs):
    """Half-spectrum carry-rebuild pre-transform step: same dual-rebuild
    algebra as _e1c_kernel (xi = mu1*fwd - v, rho = mu3*image - b,
    eta_eff = mu2*psi - a) with spatial planes in the split lane layout
    and the packed-real W transform in-kernel."""
    mats = tuple(r[:] for r in refs[:_N_RMATS])
    (rkr_ref, rki_ref, vr_ref, vi_ref,
     vo_ref, a0o_ref, a1o_ref, bo_ref) = refs[_N_RMATS:]
    f32 = jnp.float32
    sc_a, sc_b = _tv_scales(mu2, mu3, tau)
    img_c = imgc_ref[:].astype(f32)
    ximg = jnp.concatenate([imgp_ref[:].astype(f32)[-1:], img_c,
                            imgn_ref[:].astype(f32)[:1]], axis=0)
    psi0_ext = ximg[:-1] - ximg[1:]
    a0_ext = _load_carry(jnp.concatenate([a0c_ref[:], a0n_ref[:][:1]],
                                         axis=0), sc_a)
    eta0_eff = mu2 * psi0_ext - a0_ext
    thr = tau / mu2
    u0_new = _soft(psi0_ext + eta0_eff / mu2, thr)
    a0 = mu2 * u0_new - eta0_eff
    adj0 = a0[1:] - a0[:-1]
    _store_carry(a0o_ref, a0[:-1], sc_a)

    # W-axis TV in the even/odd split lane layout
    psi1 = _split_roll_p1(img_c, mh) - img_c
    eta1_eff = mu2 * psi1 - _load_carry(a1_ref[:], sc_a)
    u1_new = _soft(psi1 + eta1_eff / mu2, thr)
    a1 = mu2 * u1_new - eta1_eff
    adj1 = _split_roll_m1(a1, mh) - a1
    _store_carry(a1o_ref, a1, sc_a)

    rho = mu3 * img_c - _load_carry(b_ref[:], sc_b)
    W = jnp.maximum(rho / mu3 + img_c, 0.0)
    b = mu3 * W - rho
    _store_carry(bo_ref, b, sc_b)
    rk = b + adj0 + adj1

    fwdv = fwd_ref[:].astype(f32)
    xi = mu1 * fwdv - _load_carry(v_ref[:], _v_scale(mu1))
    xdv = c_out + (c_in - c_out) * mask_ref[:].astype(f32)
    X = xdv * (xi + mu1 * fwdv + dp_ref[:].astype(f32))
    v = mu1 * X - xi
    _store_carry(vo_ref, v, _v_scale(mu1))

    if _CONCAT_FUSE:
        brr = rk.shape[0]
        zr, zi = _w_rfwd_core(jnp.concatenate([rk, v], axis=0), n1, n2, mats)
        rkr_ref[:] = zr[:brr].astype(rkr_ref.dtype)
        rki_ref[:] = zi[:brr].astype(rki_ref.dtype)
        vr_ref[:] = zr[brr:].astype(vr_ref.dtype)
        vi_ref[:] = zi[brr:].astype(vi_ref.dtype)
    else:
        zr, zi = _w_rfwd_core(rk, n1, n2, mats)
        rkr_ref[:] = zr.astype(rkr_ref.dtype)
        rki_ref[:] = zi.astype(rki_ref.dtype)
        zr, zi = _w_rfwd_core(v, n1, n2, mats)
        vr_ref[:] = zr.astype(vr_ref.dtype)
        vi_ref[:] = zi.astype(vi_ref.dtype)


def _w_rinv_dual_kernel(n1, n2, scale,
                        a0r_ref, a0i_ref, a1r_ref, a1i_ref,
                        p0r_ref, p0i_ref, p1r_ref, p1i_ref, *refs):
    mats = tuple(r[:] for r in refs[:_N_RMATS])
    img_ref, fwd_ref = refs[_N_RMATS:]
    f32 = jnp.float32
    # patch the exact DC/Nyquist packed lane (column 0, column vectors
    # computed in XLA) in-kernel — a host-graph .at[:, 0].set would copy
    # all four full planes every iteration
    br, mh = a0r_ref.shape
    lane0 = jax.lax.broadcasted_iota(jnp.int32, (br, mh), 1) == 0
    a0r = jnp.where(lane0, p0r_ref[:][:, :1], a0r_ref[:].astype(f32))
    a0i = jnp.where(lane0, p0i_ref[:][:, :1], a0i_ref[:].astype(f32))
    a1r = jnp.where(lane0, p1r_ref[:][:, :1], a1r_ref[:].astype(f32))
    a1i = jnp.where(lane0, p1i_ref[:][:, :1], a1i_ref[:].astype(f32))
    if _CONCAT_FUSE and _DUAL_CONCAT:
        out = _w_rinv_core(jnp.concatenate([a0r, a1r], axis=0),
                           jnp.concatenate([a0i, a1i], axis=0),
                           n1, n2, scale, mats)
        img_ref[:] = out[:br].astype(img_ref.dtype)
        fwd_ref[:] = out[br:].astype(fwd_ref.dtype)
        return
    img_ref[:] = _w_rinv_core(a0r, a0i, n1, n2, scale,
                              mats).astype(img_ref.dtype)
    fwd_ref[:] = _w_rinv_core(a1r, a1i, n1, n2, scale,
                              mats).astype(fwd_ref.dtype)


def e1_rcarry(image, fwd, v, b, a0, a1, mask, dp,
              mu1, mu2, mu3, tau, block_rows=None):
    """Half-spectrum carry-rebuild pre-transform step (see _e1cr_kernel).
    Returns (rk_wr, rk_wi, v_wr, v_wi, v', a0', a1', b') with the rk/v
    spectra at HALF width."""
    m, n_full = fwd.shape
    mh = n_full // 2
    br = block_rows or _e_block_rows(m, n_full)
    nb = m // br
    mats, scale, n1, n2 = _rplan_mats(n_full, False)
    mats = _prune_mats(mats, "rfwd", n1)
    spec_c = pl.BlockSpec((br, n_full), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_p = pl.BlockSpec((br, n_full), lambda i: ((i - 1) % nb, 0),
                          memory_space=pltpu.VMEM)
    spec_n = pl.BlockSpec((br, n_full), lambda i: ((i + 1) % nb, 0),
                          memory_space=pltpu.VMEM)
    spec_h = pl.BlockSpec((br, mh), lambda i: (i, 0), memory_space=pltpu.VMEM)
    io_h = jax.ShapeDtypeStruct((m, mh), _IO_DTYPE)
    cr_v = jax.ShapeDtypeStruct((m, n_full), _CARRY_V_DTYPE)
    cr_tv = jax.ShapeDtypeStruct((m, n_full), _CARRY_TV_DTYPE)
    c_in = 1.0 / (1.0 + mu1)
    c_out = 1.0 / mu1
    return pl.pallas_call(
        partial(_e1cr_kernel, n1, n2, mh, mu1, mu2, mu3, tau, c_in, c_out),
        grid=(nb,),
        in_specs=[spec_p, spec_c, spec_n,          # image halo refs
                  spec_c, spec_n,                  # a0
                  spec_c,                          # a1
                  spec_c, spec_c, spec_c,          # v, b, fwd
                  spec_c, spec_c]                  # mask, dp
                 + _const_specs(mats),
        out_specs=(spec_h,) * 4 + (spec_c,) * 4,
        out_shape=(io_h, io_h, io_h, io_h,          # rk/v half spectra
                   cr_v, cr_tv, cr_tv, cr_tv),      # v', a0', a1', b'
        interpret=_INTERPRET,
    )(image, image, image, a0, a0, a1, v, b, fwd, mask, dp, *mats)


def irfft_w_dual(a0r, a0i, a1r, a1i, p0r, p0i, p1r, p1i, block_rows=None):
    """(image, forward) = packed-real dual W-inverse with the exact
    DC/Nyquist lane patched in-kernel from the (m, 128) column operands
    p* — the whole post-transform step of the half-spectrum
    carry-rebuild pipeline."""
    m, mh = a0r.shape
    n_full = 2 * mh
    br = block_rows or _e_block_rows(m, n_full)
    nb = m // br
    mats, scale, n1, n2 = _rplan_mats(n_full, True)
    mats = _prune_mats(mats, "rinv", n1)
    spec_c = pl.BlockSpec((br, n_full), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_h = pl.BlockSpec((br, mh), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_col = pl.BlockSpec((br, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    io_sh = jax.ShapeDtypeStruct((m, n_full), _IO_DTYPE)
    return pl.pallas_call(
        partial(_w_rinv_dual_kernel, n1, n2, scale),
        grid=(nb,),
        in_specs=[spec_h] * 4 + [spec_col] * 4 + _const_specs(mats),
        out_specs=(spec_c, spec_c),
        out_shape=(io_sh, io_sh),
        interpret=_INTERPRET,
    )(a0r, a0i, a1r, a1i, p0r, p0i, p1r, p1i, *mats)


# ---------------------------------------------------------------------------
# v3 state placement: the X/v data-fidelity chain is row-local, so it
# rides INSIDE the dual W-inverse kernel where the forward estimate is
# already in registers — the fwd plane never crosses HBM — and the
# image halo rows that the TV kernel needs come back as skinny
# (nb, N) first/last-row tensors instead of whole block-shifted refs
# (which re-fetch the full image plane twice).  Per iteration at 12MP
# this deletes ~500 MB of HBM traffic (fwd write+read, 2x image
# re-fetch, 1x a0 re-fetch) and frees enough VMEM for 32-row blocks.
# ---------------------------------------------------------------------------


def _w_rinv_dual_state_kernel(n1, n2, scale, mu1, c_in, c_out, with_sat,
                              a0r_ref, a0i_ref, a1r_ref, a1i_ref,
                              p0r_ref, p0i_ref, p1r_ref, p1i_ref,
                              v_ref, mask_ref, dp_ref, *refs):
    """Dual packed-real W-inverse + in-register X/v update: image and
    forward land from the spectra, then xi = mu1*fwd - v, X, v' and the
    forward W transform of v' — fwd never leaves the kernel."""
    imats = tuple(r[:] for r in refs[:_N_RMATS])
    fmats = tuple(r[:] for r in refs[_N_RMATS:2 * _N_RMATS])
    (img_ref, vo_ref, vwr_ref, vwi_ref, *opt_sat) = refs[2 * _N_RMATS:]
    sat_ref = opt_sat[0] if opt_sat else None
    f32 = jnp.float32
    br, mh = a0r_ref.shape
    lane0 = jax.lax.broadcasted_iota(jnp.int32, (br, mh), 1) == 0
    a0r = jnp.where(lane0, p0r_ref[:][:, :1], a0r_ref[:].astype(f32))
    a0i = jnp.where(lane0, p0i_ref[:][:, :1], a0i_ref[:].astype(f32))
    a1r = jnp.where(lane0, p1r_ref[:][:, :1], a1r_ref[:].astype(f32))
    a1i = jnp.where(lane0, p1i_ref[:][:, :1], a1i_ref[:].astype(f32))
    if _CONCAT_FUSE and _DUAL_CONCAT:
        out = _w_rinv_core(jnp.concatenate([a0r, a1r], axis=0),
                           jnp.concatenate([a0i, a1i], axis=0),
                           n1, n2, scale, imats)
        image, fwd = out[:br], out[br:]
    else:
        image = _w_rinv_core(a0r, a0i, n1, n2, scale, imats)
        fwd = _w_rinv_core(a1r, a1i, n1, n2, scale, imats)
    img_ref[:] = image.astype(img_ref.dtype)

    xi = mu1 * fwd - _load_carry(v_ref[:], _v_scale(mu1))
    xdv = c_out + (c_in - c_out) * mask_ref[:].astype(f32)
    X = xdv * (xi + mu1 * fwd + dp_ref[:].astype(f32))
    v = mu1 * X - xi
    _store_carry(vo_ref, v, _v_scale(mu1))
    if sat_ref is not None:
        if with_sat and _CARRY_V_DTYPE == jnp.int16 and _SAT_ENABLED:
            # pre-quantization headroom: the v scale is parameter-
            # derived, not analytic — report true overshoot
            _sat_update(sat_ref, jnp.maximum(jnp.max(v), -jnp.min(v))
                        * (1.0 / _v_scale(mu1)))
        else:
            _sat_zero(sat_ref)
    zr, zi = _w_rfwd_core(v, n1, n2, fmats, fold=_MM_FOLD_STATE_FWD)
    vwr_ref[:] = zr.astype(vwr_ref.dtype)
    vwi_ref[:] = zi.astype(vwi_ref.dtype)


def irfft_w_dual_state(a0r, a0i, a1r, a1i, p0r, p0i, p1r, p1i,
                       v, mask, dp, mu1, block_rows=None, with_sat=True):
    """v3 post-transform step (see _w_rinv_dual_state_kernel).  Returns
    (image, v', v'_wr, v'_wi, sat) — sat is the (8, 128) carry-
    saturation channel (max pre-quantization |v| / full scale over all
    grid steps; >= 1.0 means the int16 carry clipped).  The v reduce
    costs ~0.3 ms/call at 12MP (VPU floor over 1M f32/grid step), so
    the solver samples it every LPT_SAT_EVERY-th iteration
    (with_sat=False compiles a variant that emits a zero channel)."""
    m, mh = a0r.shape
    n_full = 2 * mh
    br = block_rows or _e_block_rows_v3(m, n_full, "E2R")
    nb = m // br
    imats, scale, n1, n2 = _rplan_mats(n_full, True)
    fmats, _, _, _ = _rplan_mats(n_full, False)
    imats = _prune_mats(imats, "rinv", n1)
    fmats = _prune_mats(fmats, "rfwd", n1, fold=_MM_FOLD_STATE_FWD)
    spec_c = pl.BlockSpec((br, n_full), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_h = pl.BlockSpec((br, mh), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_col = pl.BlockSpec((br, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    io_sh = jax.ShapeDtypeStruct((m, n_full), _IO_DTYPE)
    io_h = jax.ShapeDtypeStruct((m, mh), _IO_DTYPE)
    cr_v = jax.ShapeDtypeStruct((m, n_full), _CARRY_V_DTYPE)
    c_in = 1.0 / (1.0 + mu1)
    c_out = 1.0 / mu1
    # the no-sat variant drops the sat output block entirely (even the
    # dead (8,128) buffer's double-buffered footprint matters: the
    # kernel sits within ~12 KB of the 16 MB scoped-VMEM limit in some
    # jit contexts) — the caller receives zeros instead
    out_specs = (spec_c, spec_c, spec_h, spec_h)
    out_shape = (io_sh, cr_v, io_h, io_h)
    if with_sat:
        out_specs = out_specs + (_sat_spec(),)
        out_shape = out_shape + (_sat_shape(),)
    out = pl.pallas_call(
        partial(_w_rinv_dual_state_kernel, n1, n2, scale, mu1, c_in, c_out,
                with_sat),
        grid=(nb,),
        in_specs=[spec_h] * 4 + [spec_col] * 4 + [spec_c] * 3
                 + _const_specs(imats) + _const_specs(fmats),
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_INTERPRET,
    )(a0r, a0i, a1r, a1i, p0r, p0i, p1r, p1i, v, mask, dp, *imats, *fmats)
    if with_sat:
        return out
    return out + (jnp.zeros(_SAT_BLOCK, jnp.float32),)


def _e_block_rows_v3(m, w, which="E1R"):
    """Row-block for the v3 state kernels: fewer live buffers than the
    v2 carries, so larger blocks fit VMEM (fewer grid steps -> less
    per-step matmul latency).  Default 32 with bf16 carries (measured
    best at 12MP within the 16 MB scoped-VMEM limit); f32 carries double
    the a0/a1/b/v block buffers, so the default drops to 16 (32 OOMs the
    scoped allocation by ~3 MB at 12MP).  LPT_E_BLOCK3 overrides both
    kernels, LPT_E1R_BLOCK / LPT_E2R_BLOCK individually."""
    env = (_os.environ.get(f"LPT_{which}_BLOCK")
           or _os.environ.get("LPT_E_BLOCK3"))
    small_tv = _CARRY_TV_DTYPE != jnp.float32
    if which == "E1R":
        # e1_rtv blocks hold a0 x2/a1/b (TV dtype) + image/rk (io);
        # 48 exceeds the 16 MB scoped-VMEM limit by ~0.4 MB even at i16
        default = 32 if small_tv else 16
    else:
        # the dual-inverse state kernel holds the v carry and two full
        # mats stacks; with a 4-byte v, 32 exceeds scoped VMEM by
        # ~2.9 MB -> 24.  A 2-byte v (bf16 or i16 fixed point) frees
        # enough for the measured-best 32-row blocks.
        small_v = jnp.dtype(_CARRY_V_DTYPE).itemsize == 2
        default = 32 if small_v else (24 if small_tv else 16)
    return _pick_block(m, int(env) if env else default)


def _e1rtv_kernel(n1, n2, mh, mu2, mu3, tau,
                  imgc_ref, imgp_ref, imgn_ref, a0c_ref, a0n_ref,
                  a1_ref, b_ref, *refs):
    """v3 pre-transform step: TV/W chains + rk assembly + forward W
    transform of rk.  The image/a0 halo rows arrive as thin STRIPE refs
    of the same planes (8 rows instead of whole neighbour blocks):
    imgp = last stripe of block i-1, imgn/a0n = first stripe of block
    i+1 (periodic padded grid)."""
    fmats = tuple(r[:] for r in refs[:_N_RMATS])
    (rkr_ref, rki_ref, a0o_ref, a1o_ref, bo_ref, sat_ref) = refs[_N_RMATS:]
    f32 = jnp.float32
    sc_a, sc_b = _tv_scales(mu2, mu3, tau)
    img_c = imgc_ref[:].astype(f32)
    ximg = jnp.concatenate([imgp_ref[:].astype(f32)[-1:], img_c,
                            imgn_ref[:].astype(f32)[:1]], axis=0)
    psi0_ext = ximg[:-1] - ximg[1:]
    a0_ext = _load_carry(jnp.concatenate([a0c_ref[:], a0n_ref[:][:1]],
                                         axis=0), sc_a)
    eta0_eff = mu2 * psi0_ext - a0_ext
    thr = tau / mu2
    u0_new = _soft(psi0_ext + eta0_eff / mu2, thr)
    a0 = mu2 * u0_new - eta0_eff
    adj0 = a0[1:] - a0[:-1]
    q0 = _store_carry(a0o_ref, a0[:-1], sc_a)

    psi1 = _split_roll_p1(img_c, mh) - img_c
    eta1_eff = mu2 * psi1 - _load_carry(a1_ref[:], sc_a)
    u1_new = _soft(psi1 + eta1_eff / mu2, thr)
    a1 = mu2 * u1_new - eta1_eff
    adj1 = _split_roll_m1(a1, mh) - a1
    q1 = _store_carry(a1o_ref, a1, sc_a)

    rho = mu3 * img_c - _load_carry(b_ref[:], sc_b)
    W = jnp.maximum(rho / mu3 + img_c, 0.0)
    b = mu3 * W - rho
    qb = _store_carry(bo_ref, b, sc_b)
    del q0, q1, qb  # stored values unused: sat reads the f32 pre-images
    if _CARRY_TV_DTYPE == jnp.int16 and _SAT_ENABLED:
        # pre-quantization headroom on the f32 values already in
        # registers, as max/-min (no abs temp).  Integer reduces over
        # the stored i16 planes do NOT lower in Mosaic (measured:
        # compile failure) and widening them to i32 costs ~0.9 ms/call
        # in temporaries — the f32 reduce costs ~0.1 ms.
        m = jnp.maximum(
            jnp.maximum(jnp.maximum(jnp.max(a0), -jnp.min(a0)),
                        jnp.maximum(jnp.max(a1), -jnp.min(a1)))
            * (1.0 / sc_a),
            jnp.maximum(jnp.max(b), -jnp.min(b)) * (1.0 / sc_b))
        _sat_update(sat_ref, m)
    else:
        _sat_zero(sat_ref)
    rk = b + adj0 + adj1

    zr, zi = _w_rfwd_core(rk, n1, n2, fmats)
    rkr_ref[:] = zr.astype(rkr_ref.dtype)
    rki_ref[:] = zi.astype(rki_ref.dtype)


def e1_rtv(image, a0, a1, b, mu2, mu3, tau, block_rows=None):
    """v3 pre-transform step (see _e1rtv_kernel).  Returns
    (rk_wr, rk_wi, a0', a1', b', sat) — sat is the (8, 128) TV-carry
    saturation channel (max pre-quantization |carry| / its full scale;
    >= 1.0 means an int16 TV carry clipped)."""
    m, n_full = image.shape
    mh = n_full // 2
    br = block_rows or _e_block_rows_v3(m, n_full, "E1R")
    nb = m // br
    fmats, scale, n1, n2 = _rplan_mats(n_full, False)
    fmats = _prune_mats(fmats, "rfwd", n1)
    spec_c = pl.BlockSpec((br, n_full), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_h = pl.BlockSpec((br, mh), lambda i: (i, 0), memory_space=pltpu.VMEM)
    # halo stripes: 8-row blocks of the SAME planes at the neighbouring
    # block boundaries (Pallas TPU requires sublane dims divisible by 8;
    # tiny interpret-mode grids fall back to whole-block halos)
    st = 8 if (br % 8 == 0 and m % 8 == 0) else br
    q = br // st
    nbs = m // st
    spec_sp = pl.BlockSpec((st, n_full), lambda i: ((i * q - 1) % nbs, 0),
                           memory_space=pltpu.VMEM)
    spec_sn = pl.BlockSpec((st, n_full), lambda i: (((i + 1) % nb) * q, 0),
                           memory_space=pltpu.VMEM)
    io_h = jax.ShapeDtypeStruct((m, mh), _IO_DTYPE)
    cr_sh = jax.ShapeDtypeStruct((m, n_full), _CARRY_TV_DTYPE)
    return pl.pallas_call(
        partial(_e1rtv_kernel, n1, n2, mh, mu2, mu3, tau),
        grid=(nb,),
        in_specs=[spec_c, spec_sp, spec_sn,
                  spec_c, spec_sn, spec_c, spec_c]
                 + _const_specs(fmats),
        out_specs=(spec_h, spec_h, spec_c, spec_c, spec_c, _sat_spec()),
        out_shape=(io_h, io_h, cr_sh, cr_sh, cr_sh, _sat_shape()),
        interpret=_INTERPRET,
    )(image, image, image, a0, a0, a1, b, *fmats)


def ifft_h_dual(vr, vi, hr, hi, h):
    """(image_plane, forward_plane) = (ifft_h(v), ifft_h(H*v)) with the
    spectrum read once and the filter multiply fused."""
    _, _, _, _, _, _, _, n1, n2 = _mats(h, True)
    w = vr.shape[-1]
    xr = vr.reshape(n1, n2, w)
    xi = vi.reshape(n1, n2, w)
    fhr = hr.reshape(n1, n2, w)
    fhi = hi.reshape(n1, n2, w)
    a0r, a0i, a1r, a1i = h_passB_dual(xr, xi, fhr, fhi, h)
    if _CONCAT_FUSE:
        (z0r, z0i), (z1r, z1i) = h_passA_pair(a0r, a0i, a1r, a1i, h, True)
    else:
        z0r, z0i = h_passA(a0r, a0i, h, True)
        z1r, z1i = h_passA(a1r, a1i, h, True)
    return ((z0r.reshape(h, w), z0i.reshape(h, w)),
            (z1r.reshape(h, w), z1i.reshape(h, w)))
