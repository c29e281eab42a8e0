"""Dataset-scale benchmark harness (reference: lensless/eval/benchmark.py:62-459).

``benchmark(reconstruct, batches, ...)`` evaluates a reconstruction
callable over (lensless, lensed) pairs with the reference's semantics:

* default metrics MSE / LPIPS_Vgg / PSNR / SSIM / ReconstructionError
  (benchmark.py:141-155); LPIPS needs pretrained weights (``lpips_fn``)
  and is skipped with a notice otherwise — this environment cannot
  download the VGG checkpoint;
* optional shot noise on the measurement (snr), ROI crop, per-image
  max-normalization before metrics (benchmark.py:337-344);
* unrolled-output metrics ``<name>_unrolled`` and the pre-processor
  auxiliary error ``ReconstructionError_PreProc`` when the reconstructor
  returns intermediates (benchmark.py:382-445);
* Parameterize-and-Perturb test-time adaptation inside the loop
  (benchmark.py:199-240) via eval/pnp.parameterize_perturb;
* MSE/LPIPS averaged by batch-sum / n_samples, others by per-image mean
  (benchmark.py:448-457).

Mesh-sharded evaluation: pass ``mesh`` (with a 'data' axis) and the
batch arrays are placed with a ``NamedSharding`` over that axis before
the jitted ``reconstruct`` runs — XLA partitions the whole forward and
the metric computation across devices (the reference's DataLoader loop
is single-device, benchmark.py:169).
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .metrics import max_normalize, psnr, ssim


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


def _apply_crop(arr, crop):
    v0, v1 = crop["vertical"]
    h0, h1 = crop["horizontal"]
    return arr[..., v0:v1, h0:h1, :]


def _shard_batch(arrays, mesh):
    """Place batch arrays with a batch-axis NamedSharding so the jitted
    reconstruct + metrics partition over the mesh 'data' axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    return [None if a is None else jax.device_put(a, sharding) for a in arrays]


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
    model=None,
    lpips_fn: Optional[Callable] = None,
    lpips_alex_fn: Optional[Callable] = None,
    unrolled_output_factor: bool = False,
    pre_process_aux: bool = False,
    pnp: Optional[dict] = None,
    mesh=None,
) -> dict:
    """Evaluate ``reconstruct(lensless, ...) -> prediction`` over batches.

    batches: iterable of dicts with 'lensless' and 'lensed' (B, D, H, W, C)
    arrays; optional 'psfs' (per-sample PSFs, multimask datasets) and
    'background' entries are forwarded to ``reconstruct`` when it accepts
    them (benchmark.py:244-245, 184-187).

    model: a ReconstructionAlgorithm (or any object with
    ``reconstruction_error(prediction, lensless)``) enabling the
    ReconstructionError metric (benchmark.py:350-355).

    lpips_fn: callable (pred_4d, target_4d) -> per-image LPIPS values
    (e.g. a jitted eval/lpips.LPIPS apply with converted weights).
    lpips_alex_fn: same contract with the AlexNet backbone — emits the
    LPIPS_Alex column the literature baselines report (reference
    scripts/eval/benchmark_recon.py:387-414).

    unrolled_output_factor / pre_process_aux: when set, ``reconstruct``
    must return ``(prediction, unrolled, pre_processed, psfs_out)``
    (the reference's output_intermediate tuple, benchmark.py:260-264).

    pnp: {'mu', 'lr', 'n_iter', 'apply_fn', 'params0', 'forward_conv'} —
    Parameterize-and-Perturb adaptation per batch; ``reconstruct`` is
    ignored for the prediction (benchmark.py:199-240).

    Returns metric name -> average over all samples.
    """
    import inspect

    from ..ops.noise import add_shot_noise

    if lpips_fn is None and lpips_alex_fn is None:
        # weights fixture path (eval/lpips.py): LPT_LPIPS_WEIGHTS /
        # LPT_LPIPS_ALEX_WEIGHTS env hooks auto-enable the LPIPS columns
        from .lpips import metrics_from_env

        lpips_fn, lpips_alex_fn = metrics_from_env()

    metrics_fn = jax.jit(lambda p, t: _batch_metrics(p, t, normalize))
    sums: dict = {}
    counts: dict = {}
    total = 0
    if key is None:
        key = jax.random.PRNGKey(0)
    try:
        accepted = set(inspect.signature(reconstruct).parameters)
    except (TypeError, ValueError):
        accepted = set()

    if pnp is not None:
        for k in ("mu", "lr", "n_iter", "apply_fn", "params0", "forward_conv"):
            assert k in pnp, f"pnp requires '{k}'"

    def add(name, values, n):
        sums[name] = sums.get(name, 0.0) + float(jnp.sum(values))
        counts[name] = counts.get(name, 0) + n

    for batch in batches:
        lensless = jnp.asarray(batch["lensless"])
        lensed = jnp.asarray(batch["lensed"])
        psfs = batch.get("psfs")
        background = batch.get("background")
        if snr is not None:
            key, sub = jax.random.split(key)
            lensless = add_shot_noise(lensless, snr, sub)
        if mesh is not None:
            lensless, lensed, psfs, background = _shard_batch(
                [lensless, lensed,
                 None if psfs is None else jnp.asarray(psfs),
                 None if background is None else jnp.asarray(background)],
                mesh)

        if pnp is not None:
            from .pnp import parameterize_perturb

            pred, _ = parameterize_perturb(
                pnp["apply_fn"], pnp["params0"], pnp["forward_conv"],
                lensless, mu=pnp["mu"], lr=pnp["lr"], n_iter=pnp["n_iter"])
        else:
            kwargs = {}
            if psfs is not None and "psfs" in accepted:
                kwargs["psfs"] = jnp.asarray(psfs)
            if background is not None and "background" in accepted:
                kwargs["background"] = jnp.asarray(background)
            pred = reconstruct(lensless, **kwargs)

        unrolled_out = pre_process_out = None
        if isinstance(pred, (tuple, list)):
            # reference output_intermediate ordering (benchmark.py:260-264)
            if len(pred) > 1:
                unrolled_out = pred[1]
            if len(pred) > 2:
                pre_process_out = pred[2]
            pred = pred[0]
        pred_original = pred

        if save_idx is not None and save_dir is not None:
            from ..data.io import save_image

            for local_i in range(pred.shape[0]):
                global_i = total + local_i
                if global_i in save_idx:
                    save_image(np.asarray(pred[local_i]),
                               f"{save_dir}/recon_{global_i}.png")

        if crop is not None:
            pred = _apply_crop(pred, crop)
            lensed_c = _apply_crop(lensed, crop)
        else:
            lensed_c = lensed

        n = int(lensless.shape[0])
        vals = metrics_fn(pred, lensed_c)
        add("MSE", vals["MSE"], n)
        add("PSNR", vals["PSNR"], n)
        add("SSIM", vals["SSIM"], n)

        if lpips_fn is not None or lpips_alex_fn is not None:
            p4 = max_normalize(pred.reshape(-1, *pred.shape[-3:]))
            t4 = max_normalize(lensed_c.reshape(-1, *lensed_c.shape[-3:]))
            if p4.shape[-1] == 1:   # LPIPS needs 3 channels
                p4 = jnp.repeat(p4, 3, axis=-1)
                t4 = jnp.repeat(t4, 3, axis=-1)
            if lpips_fn is not None:
                add("LPIPS_Vgg", lpips_fn(p4, t4), n)
            if lpips_alex_fn is not None:
                add("LPIPS_Alex", lpips_alex_fn(p4, t4), n)

        if model is not None and hasattr(model, "reconstruction_error"):
            err = model.reconstruction_error(prediction=pred_original,
                                             lensless=lensless)
            add("ReconstructionError", err, n)

        if unrolled_output_factor and unrolled_out is not None:
            u = _apply_crop(unrolled_out, crop) if crop is not None \
                else unrolled_out
            uvals = metrics_fn(u, lensed_c)
            add("MSE_unrolled", uvals["MSE"], n)
            add("PSNR_unrolled", uvals["PSNR"], n)
            add("SSIM_unrolled", uvals["SSIM"], n)
            if lpips_fn is not None or lpips_alex_fn is not None:
                p4 = max_normalize(u.reshape(-1, *u.shape[-3:]))
                t4 = max_normalize(lensed_c.reshape(-1, *lensed_c.shape[-3:]))
                if p4.shape[-1] == 1:
                    p4 = jnp.repeat(p4, 3, axis=-1)
                    t4 = jnp.repeat(t4, 3, axis=-1)
                if lpips_fn is not None:
                    add("LPIPS_Vgg_unrolled", lpips_fn(p4, t4), n)
                if lpips_alex_fn is not None:
                    add("LPIPS_Alex_unrolled", lpips_alex_fn(p4, t4), n)

        if pre_process_aux and pre_process_out is not None and model is not None:
            err = model.reconstruction_error(prediction=pred_original,
                                             lensless=pre_process_out)
            add("ReconstructionError_PreProc", err, n)

        if extra_metrics:
            for name, fn in extra_metrics.items():
                add(name, fn(pred, lensless, lensed_c), n)
        total += n

    return {name: s / counts[name] for name, s in sums.items()}
