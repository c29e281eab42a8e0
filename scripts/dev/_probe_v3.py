"""Per-kernel timing of the v3 rfused pipeline at 12MP (timing only).

Difference-method loops with a scalar loop-carried dependency, one
kernel per jit. Usage: python _probe_v3.py [e1|hcd|invs|dc|all]
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
os.environ.setdefault("LPT_SPLIT_IO", "bf16")
os.environ.setdefault("LPT_CARRY_IO", "f32")
os.environ.setdefault("LPT_CARRY_TV", "i16")
os.environ.setdefault("LPT_CARRY_V", "i16")
os.environ.setdefault("LPT_PALLAS_PRECISION", "default")
import numpy as np, jax, jax.numpy as jnp
from lenslesspicam_tpu.recon import admm_split
from lenslesspicam_tpu.ops import pallas_kernels2 as pk2

shape = (3040, 4056)
rng = np.random.RandomState(0)
psf2d = rng.rand(*shape).astype(np.float32); psf2d /= np.linalg.norm(psf2d)
data2d = rng.rand(*shape).astype(np.float32)
pre = admm_split.precompute_rsplit(psf2d, data2d)
ph, pw = pre.padded_shape
mh = pw // 2
io = pk2._IO_DTYPE
cr = pk2._CARRY_V_DTYPE
p = admm_split.ADMMParams()

mask_c = jnp.asarray(pre.mask, io)
dp_c = jnp.asarray(pre.data_pad, io)
Hr_c, Hi_c, R_c = (jnp.asarray(pre.Hr, io), jnp.asarray(pre.Hi, io),
                   jnp.asarray(pre.R, io))
H0 = jax.lax.complex(pre.H0r, pre.H0i)
HM = jax.lax.complex(pre.HMr, pre.HMi)


def timed(fn, args, label, base=2, full=52, reps=3):
    t0 = time.time(); float(fn(*args, base)); print(f"{label}: compile {time.time()-t0:.0f}s", flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time(); float(fn(*args, full)); dt2 = time.time() - t0
        t0 = time.time(); float(fn(*args, base)); dt1 = time.time() - t0
        best = min(best, (dt2 - dt1) / (full - base))
    print(f"{label}: {best*1e3:.2f} ms/call ({1/best:.1f} calls/s)", flush=True)
    return best


@jax.jit
def loop_e1(image, a0, a1, b, n):
    def body(_, s):
        img, aa0, aa1, bb = s
        rkr, rki, a0n, a1n, bn, _sat = pk2.e1_rtv(img, aa0, aa1, bb,
                                            p.mu2, p.mu3, p.tau)
        eps = (rkr[0, 0]).astype(io) * 0
        return (img + eps, a0n, a1n, bn)
    out = jax.lax.fori_loop(0, n, body, (image, a0, a1, b))
    return out[0][::499, ::499].sum().astype(jnp.float32)


@jax.jit
def loop_hcd(rkr, rki, vr_, vi_, n):
    def body(_, s):
        a, b_, c, d = s
        (a0r, a0i), (a1r, a1i) = pk2.fft_h_combine_dual(
            a, b_, c, d, Hr_c, Hi_c, R_c, ph)
        eps = (a0r[0, 0] + a1r[0, 0]).astype(io) * 0
        return (a + eps, b_, c, d)
    out = jax.lax.fori_loop(0, n, body, (rkr, rki, vr_, vi_))
    return out[0][::499, ::499].sum().astype(jnp.float32)


@jax.jit
def loop_invs(a0r, a0i, a1r, a1i, pc, v, n):
    def body(_, s):
        a, b_, c, d, vv = s
        img, vn, vwr, vwi, _sat = pk2.irfft_w_dual_state(
            a, b_, c, d, pc, pc, pc, pc, vv, mask_c, dp_c, p.mu1)
        eps = (img[0, 0] + vwr[0, 0]).astype(io) * 0
        return (a + eps, b_, c, d, vn)
    out = jax.lax.fori_loop(0, n, body, (a0r, a0i, a1r, a1i, v))
    return out[0][::499, ::499].sum().astype(jnp.float32)


@jax.jit
def loop_dc(rkr, rki, vr_, vi_, h0r, h0i, hmr, hmi, r0, rm, n):
    # complex closure constants can't materialize over the tunnel
    # (complex64 d2h unimplemented) — H0/HM arrive as r/i args
    f32 = jnp.float32
    H0_ = jax.lax.complex(h0r, h0i)
    HM_ = jax.lax.complex(hmr, hmi)

    def body(_, s):
        a, b_, c, d = s
        cols = jnp.stack([a[:, 0], b_[:, 0], c[:, 0], d[:, 0]])
        A0, AM, B0, BM = jnp.fft.fft(cols.astype(f32), axis=-1)
        F0 = r0 * (A0 + jnp.conj(H0_) * B0)
        FM = rm * (AM + jnp.conj(HM_) * BM)
        outs = jnp.fft.ifft(jnp.stack([F0, FM, H0_ * F0, HM_ * FM]),
                            axis=-1).real
        eps = outs[:, 0].sum().astype(io) * 0
        return (a + eps, b_, c, d)
    out = jax.lax.fori_loop(0, n, body, (rkr, rki, vr_, vi_))
    return out[0][::499, ::499].sum().astype(jnp.float32)


z_io = jnp.zeros((ph, pw), io)
z_cr = jnp.zeros((ph, pw), cr)
z_tv = jnp.zeros((ph, pw), pk2._CARRY_TV_DTYPE)
z_h = jnp.asarray(rng.rand(ph, mh), io)
pc = jnp.zeros((ph, 128), jnp.float32)
v0 = jnp.zeros((ph, pw), cr)

which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "e1"):
    timed(loop_e1, (z_io, z_tv, z_tv, z_tv), "e1_rtv")
if which in ("all", "hcd"):
    timed(loop_hcd, (z_h, z_h, z_h, z_h), "fft_h_combine_dual")
if which in ("all", "invs"):
    timed(loop_invs, (z_h, z_h, z_h, z_h, pc, v0), "irfft_w_dual_state")
if which in ("all", "dc"):
    timed(loop_dc, (z_h, z_h, z_h, z_h, pre.H0r, pre.H0i,
                    pre.HMr, pre.HMi, pre.R0, pre.RM), "dc_patch")
