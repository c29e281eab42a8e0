"""Per-kernel timing of the rfused pipeline at 12MP (timing only).

Each kernel is looped with a scalar loop-carried dependency (prevents
CSE/hoisting) and timed by the difference method.  The extra dependency
pass adds one cheap elementwise op per iteration — identical across
variants, so differences stay honest.
"""
import os, sys, time
import os as _o, sys as _s
_s.path.insert(0, _o.path.join(_o.path.dirname(_o.path.abspath(__file__)), "..", ".."))

os.environ.setdefault("LPT_SPLIT_IO", "bf16")
os.environ.setdefault("LPT_CARRY_IO", "bf16")
os.environ.setdefault("LPT_PALLAS_PRECISION", "default")
os.environ.setdefault("LPT_E_BLOCK", "16")
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
cr = pk2._CARRY_DTYPE
p = admm_split.ADMMParams()

mask_c = jnp.asarray(pre.mask, io)
dp_c = jnp.asarray(pre.data_pad, io)
Hr_c, Hi_c, R_c = (jnp.asarray(pre.Hr, io), jnp.asarray(pre.Hi, io),
                   jnp.asarray(pre.R, io))


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
def loop_e1(image, fwd, v, b, a0, a1, mask, dp, n):
    def body(_, s):
        img, f, vv, bb, aa0, aa1 = s
        rkr, rki, vr_, vi_, vn, a0n, a1n, bn = pk2.e1_rcarry(
            img, f, vv, bb, aa0, aa1, mask, dp, p.mu1, p.mu2, p.mu3, p.tau)
        # scalar dependency: outputs feed the next iteration's inputs
        eps = (rkr[0, 0] + vr_[0, 0]).astype(io) * 0
        return (img + eps, f, vn, bn, a0n, a1n)
    out = jax.lax.fori_loop(0, n, body, (image, fwd, v, b, a0, a1))
    return out[0][::499, ::499].sum()


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
def loop_inv(a0r, a0i, a1r, a1i, pc, n):
    def body(_, s):
        a, b_, c, d = s
        img, fwd = pk2.irfft_w_dual(a, b_, c, d, pc, pc, pc, pc)
        eps = (img[0, 0] + fwd[0, 0]).astype(io) * 0
        return (a + eps, b_, c, d)
    out = jax.lax.fori_loop(0, n, body, (a0r, a0i, a1r, a1i))
    return out[0][::499, ::499].sum().astype(jnp.float32)


z_io = jnp.zeros((ph, pw), io)
z_cr = jnp.zeros((ph, pw), cr)
z_h = jnp.asarray(rng.rand(ph, mh), io)
pc = jnp.zeros((ph, 128), jnp.float32)

which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "e1"):
    timed(loop_e1, (z_io, z_io, z_cr, z_cr, z_cr, z_cr, mask_c, dp_c), "e1_rcarry")
if which in ("all", "hcd"):
    timed(loop_hcd, (z_h, z_h, z_h, z_h), "fft_h_combine_dual")
if which in ("all", "inv"):
    timed(loop_inv, (z_h, z_h, z_h, z_h, pc), "irfft_w_dual")
