"""Pure-streaming pallas bandwidth probe: out = in * 1.0001 over the
12MP padded grid, at several row-block sizes and dtypes.  Measures the
achievable HBM bandwidth ceiling for the fused-ADMM kernel shapes —
calibrates what fraction of the 820 GB/s v5e peak a Pallas row-block
pipeline can actually sustain (difference-method, in-graph loop).
"""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from functools import partial

ph, pw = 6144, 8192


def _copy_kernel(x_ref, o_ref):
    o_ref[:] = (x_ref[:].astype(jnp.float32) * 1.0001).astype(o_ref.dtype)


def _pure_copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:]


def pure_copy_plane(x, br):
    m, w = x.shape
    spec = pl.BlockSpec((br, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _pure_copy_kernel, grid=(m // br,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((m, w), x.dtype),
    )(x)


def copy_plane(x, br):
    m, w = x.shape
    spec = pl.BlockSpec((br, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _copy_kernel, grid=(m // br,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((m, w), x.dtype),
    )(x)


def timed(fn, args, label, gbytes, base=2, full=52, reps=3):
    t0 = time.time(); float(fn(*args, base))
    print(f"{label}: compile {time.time()-t0:.0f}s", flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time(); float(fn(*args, full)); dt2 = time.time() - t0
        t0 = time.time(); float(fn(*args, base)); dt1 = time.time() - t0
        best = min(best, (dt2 - dt1) / (full - base))
    print(f"{label}: {best*1e3:.3f} ms/call -> {gbytes/best:.0f} GB/s",
          flush=True)


def _copy_kernel_consts(x_ref, *refs):
    o_ref = refs[-1]
    acc = x_ref[:].astype(jnp.float32)
    # touch one element of each const so they can't be DCE'd
    bump = sum(r[0, 0] for r in refs[:-1]) * 0.0
    o_ref[:] = (acc + bump).astype(o_ref.dtype)


def copy_plane_consts(x, br, n_consts):
    m, w = x.shape
    spec = pl.BlockSpec((br, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    consts = [jnp.ones((128, 128), jnp.float32) for _ in range(n_consts)]
    return pl.pallas_call(
        _copy_kernel_consts, grid=(m // br,),
        in_specs=[spec] + [cspec] * n_consts, out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((m, w), x.dtype),
    )(x, *consts)


def main_consts():
    x0 = jnp.asarray(np.random.rand(ph, pw), jnp.bfloat16)
    nbytes = ph * pw * 2
    for n_consts in (4, 40):
        for br in (16, 32):
            @jax.jit
            def loop(x, n, br=br, nc=n_consts):
                def body(_, s):
                    return copy_plane_consts(s, br, nc)
                out = jax.lax.fori_loop(0, n, body, x)
                return out[::499, ::499].sum().astype(jnp.float32)
            timed(loop, (x0,), f"copy bf16 consts={n_consts} br={br}",
                  2 * nbytes / 1e9)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "consts":
        return main_consts()
    which = sys.argv[1] if len(sys.argv) > 1 else "mul"
    dtypes = ((jnp.float32, "f32"), (jnp.bfloat16, "bf16"),
              (jnp.float16, "f16"), (jnp.int32, "i32"))
    fn = pure_copy_plane if which == "pure" else copy_plane
    for dtype, name in dtypes:
        if which == "pure" and name == "i32":
            x0 = jnp.asarray((np.random.rand(ph, pw) * 100).astype(np.int32))
        elif name == "i32":
            continue
        else:
            x0 = jnp.asarray(np.random.rand(ph, pw), dtype)
        nbytes = ph * pw * x0.dtype.itemsize
        for br in (16, 32):
            @jax.jit
            def loop(x, n, br=br):
                def body(_, s):
                    return fn(s, br)
                out = jax.lax.fori_loop(0, n, body, x)
                return out[::499, ::499].sum().astype(jnp.float32)
            timed(loop, (x0,), f"{which} {name} br={br}", 2 * nbytes / 1e9)


if __name__ == "__main__":
    main()
