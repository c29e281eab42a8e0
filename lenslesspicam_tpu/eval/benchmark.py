"""Dataset-scale benchmark harness (reference: lensless/eval/benchmark.py:62-459).

``benchmark(reconstruct, dataset, ...)`` evaluates a reconstruction
callable over (lensless, lensed) pairs, with the reference's semantics:
optional shot noise on the measurement, max-normalization before metrics,
weighted averaging over batches, and ReconstructionError.  Unlike the
reference (torch DataLoader, batchsize-1 apply loop), batches are
evaluated by a single jit function that can be sharded over the mesh
'data' axis.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .metrics import max_normalize, mse, psnr, ssim


def _batch_metrics(pred, lensed, normalize=True):
    if pred.ndim == 5:
        pred = pred[:, 0] if pred.shape[1] == 1 else pred.mean(axis=1)
    if lensed.ndim == 5:
        lensed = lensed[:, 0] if lensed.shape[1] == 1 else lensed.mean(axis=1)
    if normalize:
        pred = max_normalize(pred)
        lensed = max_normalize(lensed)
    return {
        "MSE": jnp.mean((pred - lensed) ** 2, axis=(-1, -2, -3)),
        "PSNR": psnr(pred, lensed),
        "SSIM": ssim(pred, lensed),
    }


def benchmark(
    reconstruct: Callable,
    batches: Iterable,
    snr: Optional[float] = None,
    crop: Optional[dict] = None,
    normalize: bool = True,
    key=None,
    extra_metrics: Optional[dict] = None,
    save_idx=None,
    save_dir: Optional[str] = None,
) -> dict:
    """Evaluate ``reconstruct(lensless, ...) -> prediction`` over batches.

    batches: iterable of dicts with 'lensless' and 'lensed' (B, D, H, W, C)
    numpy/jax arrays (the data layer's loaders yield this format);
    optional 'psfs' (per-sample PSFs, multimask datasets) and
    'background' entries are forwarded to ``reconstruct`` as keyword
    arguments when it accepts them (benchmark.py:244-245, 184-187).
    crop: optional ROI dict {'vertical': (v0, v1), 'horizontal': (h0, h1)}
    applied to both prediction and ground truth before metrics
    (benchmark.py:272-292).
    save_idx/save_dir: sample indices whose reconstructions are written
    as PNGs (benchmark.py:294-330).
    Returns metric name -> weighted average over all samples.
    """
    import inspect

    from ..ops.noise import add_shot_noise

    metrics_fn = jax.jit(lambda p, t: _batch_metrics(p, t, normalize))
    sums: dict = {}
    total = 0
    if key is None:
        key = jax.random.PRNGKey(0)
    try:
        accepted = set(inspect.signature(reconstruct).parameters)
    except (TypeError, ValueError):
        accepted = set()

    for batch in batches:
        lensless = jnp.asarray(batch["lensless"])
        lensed = jnp.asarray(batch["lensed"])
        if snr is not None:
            key, sub = jax.random.split(key)
            lensless = add_shot_noise(lensless, snr, sub)

        kwargs = {}
        for field in ("psfs", "background"):
            if batch.get(field) is not None and field in accepted:
                kwargs[field] = jnp.asarray(batch[field])
        pred = reconstruct(lensless, **kwargs)

        if save_idx is not None and save_dir is not None:
            from ..data.io import save_image

            for local_i in range(pred.shape[0]):
                global_i = total + local_i
                if global_i in save_idx:
                    save_image(np.asarray(pred[local_i]),
                               f"{save_dir}/recon_{global_i}.png")

        if crop is not None:
            v0, v1 = crop["vertical"]
            h0, h1 = crop["horizontal"]
            pred = pred[..., v0:v1, h0:h1, :]
            lensed = lensed[..., v0:v1, h0:h1, :]

        vals = metrics_fn(pred, lensed)
        n = lensless.shape[0]
        for name, v in vals.items():
            sums[name] = sums.get(name, 0.0) + float(jnp.sum(v))
        if extra_metrics:
            for name, fn in extra_metrics.items():
                v = fn(pred, lensless, lensed)
                sums[name] = sums.get(name, 0.0) + float(jnp.sum(v))
        total += n

    return {name: s / total for name, s in sums.items()}
