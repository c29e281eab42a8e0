import os, time
import os as _o, sys as _s
_s.path.insert(0, _o.path.join(_o.path.dirname(_o.path.abspath(__file__)), "..", ".."))

os.environ.setdefault("LPT_SPLIT_IO", "bf16")
os.environ.setdefault("LPT_PALLAS_PRECISION", "default")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from lenslesspicam_tpu.recon import admm_split
from lenslesspicam_tpu.recon.admm import ADMMParams
from functools import partial

shape = (3040, 4056)
rng = np.random.RandomState(0)
psf = rng.rand(1, *shape, 3).astype(np.float32); psf /= np.linalg.norm(psf)
data = rng.rand(1, 1, *shape, 3).astype(np.float32)
pre, info = admm_split.precompute_rsplit_general(psf, data)

@partial(jax.jit, static_argnames=())
def run(data, n):
    out = admm_split.run_rsplit_general(pre, info, data, ADMMParams(), n)
    return jnp.sum(out[:, :, ::499, ::499, :])

jd = jnp.asarray(data)
t0 = time.time(); v = float(run(jd, 2)); print("compile+2it", v, time.time()-t0, flush=True)
best = 0.0
for _ in range(3):
    t0 = time.time(); float(run(jd, 27)); dt2 = time.time()-t0
    t0 = time.time(); float(run(jd, 2)); dt1 = time.time()-t0
    its = 25/(dt2-dt1)
    best = max(best, its)
    print(f"RGB 12MP iters/s: {its:.2f}", flush=True)
print(f"BEST {best:.2f} it/s (x3 planes)", flush=True)
