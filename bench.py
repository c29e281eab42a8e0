"""Headline benchmark: ADMM iterations/s/chip at 12 MP (north star).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline for vs_baseline: the reference's published RTX A5000 timing of
2.88 ms for 5 grayscale ADMM iterations (paper/paper.md:152) at the
DiffuserCam tutorial working resolution (1080x1920 downsampled by 4 =
270x480 grayscale).  Scaled linearly in pixel count to the 12 MP target
(3040x4056), that is 1736 it/s * (270*480)/(3040*4056) = 18.25 it/s.
FFT cost is O(N log N) so linear scaling slightly favors the baseline.

Secondary numbers (stderr): ADMM it/s at the reference's own 270x480
working resolution for a direct comparison.
"""

import json
import sys
import time

import numpy as np

REF_A5000_ITERS_PER_S = 5 / 2.88e-3  # paper/paper.md:152
REF_RESOLUTION = 270 * 480
TARGET_SHAPE = (3040, 4056)  # 12 MP (Raspberry Pi HQ sensor)
BASELINE_12MP = REF_A5000_ITERS_PER_S * REF_RESOLUTION / (
    TARGET_SHAPE[0] * TARGET_SHAPE[1]
)


def _enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/lpt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


def time_admm(shape, n_iter, base_iter=2, repeats=5):
    """it/s via the difference method: per-call overhead (dispatch, state
    init, padding) cancels between a base_iter run and an n_iter run."""
    import jax.numpy as jnp
    from lenslesspicam_tpu.recon import admm

    rng = np.random.RandomState(0)
    psf = rng.rand(1, *shape, 1).astype(np.float32)
    psf /= np.linalg.norm(psf)
    data = jnp.asarray(rng.rand(1, *shape, 1).astype(np.float32))
    data.block_until_ready()

    conv = admm.make_convolver(psf)
    psf = None  # free host copy

    # compile once (n_iter is dynamic: same executable for all counts)
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
    per_iter = (t_full - t_base) / (n_iter - base_iter)
    return 1.0 / max(per_iter, 1e-9)


def main():
    import jax

    _enable_compile_cache()
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    iters_per_s_small = time_admm((270, 480), n_iter=100)
    print(
        f"ADMM it/s at 270x480 gray: {iters_per_s_small:.1f} "
        f"(reference A5000: {REF_A5000_ITERS_PER_S:.0f})",
        file=sys.stderr,
    )

    iters_per_s = time_admm(TARGET_SHAPE, n_iter=100)
    print(f"ADMM it/s at 12MP gray: {iters_per_s:.2f}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "ADMM iterations/s/chip at 12MP (grayscale)",
                "value": round(iters_per_s, 3),
                "unit": "iter/s",
                "vs_baseline": round(iters_per_s / BASELINE_12MP, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
