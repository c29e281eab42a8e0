import os, sys, time
import os as _o, sys as _s
_s.path.insert(0, _o.path.join(_o.path.dirname(_o.path.abspath(__file__)), "..", ".."))

backend = sys.argv[1] if len(sys.argv) > 1 else "fused"
os.environ.setdefault("LPT_SPLIT_IO", "bf16")
os.environ.setdefault("LPT_CARRY_IO", "bf16")
os.environ.setdefault("LPT_PALLAS_PRECISION", "default")
import numpy as np, jax, jax.numpy as jnp
from lenslesspicam_tpu.recon import admm_split

shape = (3040, 4056)
rng = np.random.RandomState(0)
psf2d = rng.rand(*shape).astype(np.float32); psf2d /= np.linalg.norm(psf2d)
data2d = rng.rand(*shape).astype(np.float32)

if backend == "rfused":
    pre = admm_split.precompute_rsplit(psf2d, data2d)

    @jax.jit
    def run_sum(Hr, Hi, R, mask, dp, H0r, H0i, HMr, HMi, R0, RM, n):
        p = admm_split.RSplitPrecomp(Hr, Hi, R, mask, dp, H0r, H0i, HMr, HMi,
                                     R0, RM, pre.psf_shape, pre.padded_shape, pre.start)
        out = admm_split.run_split_rfused(p, admm_split.ADMMParams(), n)
        return jnp.sum(out[::499, ::499])

    args = (pre.Hr, pre.Hi, pre.R, pre.mask, pre.data_pad,
            pre.H0r, pre.H0i, pre.HMr, pre.HMi, pre.R0, pre.RM)
else:
    pre = admm_split.precompute_split(psf2d, data2d)

    @jax.jit
    def run_sum(Hr, Hi, R, Xd, dp, n):
        p = admm_split.SplitPrecomp(Hr, Hi, R, Xd, dp, pre.psf_shape,
                                    pre.padded_shape, pre.start)
        out = admm_split.run_split(p, admm_split.ADMMParams(), n, backend)
        return jnp.sum(out[::499, ::499])

    args = (pre.Hr, pre.Hi, pre.R, pre.X_divmat, pre.data_pad)

t0 = time.time()
v = float(run_sum(*args, 2))
print(f"{backend}: compile+2it ok val={v} t={time.time()-t0:.1f}s", flush=True)
best = 0.0
for _ in range(3):
    t0 = time.time(); float(run_sum(*args, 52)); dt2 = time.time() - t0
    t0 = time.time(); float(run_sum(*args, 2)); dt1 = time.time() - t0
    its = 50 / (dt2 - dt1)
    best = max(best, its)
    print(f"iters/s: {its:.2f}", flush=True)
print(f"BEST {backend} {best:.2f} it/s", flush=True)
