"""Headline benchmark: ADMM iterations/s/chip at 12 MP (north star).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline for vs_baseline: the reference's published RTX A5000 timing of
2.88 ms for 5 grayscale ADMM iterations (paper/paper.md:152) at the
DiffuserCam tutorial working resolution (1080x1920 downsampled by 4 =
270x480 grayscale).  Scaled linearly in pixel count to the 12 MP target
(3040x4056): 1736 it/s * (270*480)/(3040*4056) = 18.25 it/s.  FFT cost
is O(N log N), so linear scaling slightly favors the baseline.

The benchmark self-verifies before timing: a small ADMM reconstruction
on the accelerator must match the CPU result (guards against silent
runtime failures on experimental TPU runtimes).
"""

import json
import os
import sys
import time

import numpy as np

REF_A5000_ITERS_PER_S = 5 / 2.88e-3  # paper/paper.md:152
REF_RESOLUTION = 270 * 480
TARGET_SHAPE = (3040, 4056)  # 12 MP (Raspberry Pi HQ sensor)
BASELINE_12MP = REF_A5000_ITERS_PER_S * REF_RESOLUTION / (
    TARGET_SHAPE[0] * TARGET_SHAPE[1]
)


def _setup_jax():
    import jax

    try:
        import os

        if os.environ.get("JAX_PLATFORMS", "") == "axon":
            jax.config.update("jax_platforms", "axon,cpu")
        jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    return jax


def verify(jax):
    """Small ADMM on the accelerator must match CPU bit-closely."""
    import jax.numpy as jnp

    from lenslesspicam_tpu.recon import admm

    rng = np.random.RandomState(0)
    psf = rng.rand(1, 36, 48, 1).astype(np.float32)
    psf /= np.linalg.norm(psf)
    data = rng.rand(1, 1, 36, 48, 1).astype(np.float32)

    def run_on(device):
        with jax.default_device(device):
            conv = admm.make_convolver(psf)
            return np.asarray(admm.run_jit(conv, jnp.asarray(data), n_iter=5))

    acc = run_on(jax.devices()[0])
    try:
        cpu = run_on(jax.devices("cpu")[0])
    except RuntimeError:
        cpu = None
    if cpu is not None:
        err = float(np.abs(acc - cpu).max())
        assert err < 1e-4, f"accelerator result diverges from CPU: {err}"
        print(f"verify ok (max diff vs cpu: {err:.2e})", file=sys.stderr)
    else:
        assert np.isfinite(acc).all()
        print("verify: cpu backend unavailable, finite check only", file=sys.stderr)


def time_admm(shape, n_iter, base_iter=2, repeats=3, attempts=3):
    """it/s via the difference method: per-call overhead cancels between
    a base_iter run and an n_iter run."""
    import jax.numpy as jnp

    from lenslesspicam_tpu.recon import admm

    rng = np.random.RandomState(0)
    psf = rng.rand(1, *shape, 1).astype(np.float32)
    psf /= np.linalg.norm(psf)
    data = jnp.asarray(rng.rand(1, *shape, 1).astype(np.float32))
    data.block_until_ready()

    conv = admm.make_convolver(psf)
    psf = None

    for attempt in range(attempts):
        try:
            admm.run_jit(conv, data, n_iter=base_iter).block_until_ready()

            def best_time(k):
                best = float("inf")
                for _ in range(repeats):
                    t0 = time.perf_counter()
                    admm.run_jit(conv, data, n_iter=k).block_until_ready()
                    best = min(best, time.perf_counter() - t0)
                return best

            t_base = best_time(base_iter)
            t_full = best_time(n_iter)
            if t_full <= t_base:
                print(
                    f"warning: timing not scaling (t[{base_iter}]={t_base:.4f}s "
                    f"t[{n_iter}]={t_full:.4f}s), retrying",
                    file=sys.stderr,
                )
                continue
            per_iter = (t_full - t_base) / (n_iter - base_iter)
            return 1.0 / per_iter
        except Exception as e:  # transient runtime/tunnel errors
            print(f"attempt {attempt} failed: {e}", file=sys.stderr)
            time.sleep(5)
    raise RuntimeError("benchmark failed after retries")


def main():
    import os

    jax = _setup_jax()
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    verify(jax)

    if os.environ.get("BENCH_SMALL"):
        small = time_admm((270, 480), n_iter=100)
        print(
            f"ADMM it/s at 270x480 gray: {small:.1f} "
            f"(reference A5000: {REF_A5000_ITERS_PER_S:.0f})",
            file=sys.stderr,
        )

    # fall back to smaller grids if the (experimental) TPU tunnel cannot
    # sustain the 12 MP compile/run within the budget — the metric name
    # and baseline scale are adjusted honestly.
    ladder = [
        (TARGET_SHAPE, "12MP", BASELINE_12MP),
        ((1520, 2028), "3MP", BASELINE_12MP * 4),
        ((760, 1014), "0.77MP", BASELINE_12MP * 16),
    ]
    for shape, label, baseline in ladder:
        try:
            iters_per_s = time_admm(shape, n_iter=50)
            print(f"ADMM it/s at {label} gray: {iters_per_s:.2f}", file=sys.stderr)
            print(
                json.dumps(
                    {
                        "metric": f"ADMM iterations/s/chip at {label} (grayscale)",
                        "value": round(iters_per_s, 3),
                        "unit": "iter/s",
                        "vs_baseline": round(iters_per_s / baseline, 3),
                    }
                )
            )
            return
        except Exception as e:
            print(f"{label} benchmark failed: {e}", file=sys.stderr)
    raise RuntimeError("all benchmark sizes failed")


if __name__ == "__main__":
    main()
