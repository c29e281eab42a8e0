"""Shared flow for the pretrained-model inference scripts.

The reference repeats the same ~100-line recipe in each of
scripts/recon/{diffusercam_mirflickr,diffusercam,digicam,
multilens_ambient}.py: download a checkpoint, read its embedded Hydra
config, rebuild the test set from it, reconstruct one example with a
timed n_trials loop, save aligned crops.  Here that recipe is one
module; the per-camera scripts only pass their registry coordinates and
camera-specific extras (alignment crop, ambient background).

TPU notes: the timing loop calls ``block_until_ready`` so compile time
is excluded (first call) and dispatch is synchronous; learned models
run as one jit forward.
"""

from __future__ import annotations

import os
import time

import numpy as np


def load_bundle(camera: str, dataset: str, model_name: str,
                local_model_dir=None, model_path: str | None = None):
    """(model_path, embedded config dict).  ``model_name == "admm"``
    still downloads a sibling checkpoint purely for its dataset config
    (reference digicam.py:23-35)."""
    import yaml

    from lenslesspicam_tpu.zoo.model_dict import download_model, model_dict

    if model_path is None:
        name = model_name
        if model_name == "admm":  # any trained entry supplies the data config
            name = next(iter(model_dict[camera][dataset]))
        model_path = download_model(camera=camera, dataset=dataset, model=name,
                                    local_model_dir=local_model_dir)
    cfg_path = os.path.join(model_path, ".hydra", "config.yaml")
    with open(cfg_path) as f:
        model_config = yaml.safe_load(f)
    return model_path, model_config


def build_test_set(model_config: dict, cache_dir=None, n_files=None,
                   return_mask_label=False, hf_repo=None):
    """HFDataset from a checkpoint's embedded config (the recurring
    construction in the reference scripts)."""
    from lenslesspicam_tpu.data.datasets import HFDataset

    files = model_config.get("files", {}) or {}
    return HFDataset(
        huggingface_repo=hf_repo or files["dataset"],
        psf=files.get("huggingface_psf"),
        split="test",
        n_files=n_files,
        display_res=files.get("image_res"),
        rotate=files.get("rotate", False),
        flipud=files.get("flipud", False),
        flip_lensed=files.get("flip_lensed", False),
        downsample=files.get("downsample", 1),
        alignment=model_config.get("alignment"),
        simulation=model_config.get("simulation"),
        force_rgb=files.get("force_rgb", False),
        return_mask_label=return_mask_label,
        cache_dir=cache_dir,
    )


def build_recon(model_name: str, model_path: str, psf, n_iter: int = 100):
    """Callable ``recon(lensless[, background]) -> (B, D, H, W, C)``:
    classical ADMM for ``model_name == "admm"``, otherwise the converted
    learned model from the checkpoint."""
    import jax
    import jax.numpy as jnp

    if model_name == "admm":
        from lenslesspicam_tpu.recon import admm

        conv = admm.make_convolver(psf)

        def recon(lensless, background=None):
            data = jnp.asarray(lensless)
            if background is not None:
                data = jnp.clip(data - jnp.asarray(background), 0.0)
            return admm.run_jit(conv, data, n_iter=n_iter)

        return recon

    from lenslesspicam_tpu.zoo.model_dict import load_model

    out = load_model(model_path, psf=psf)
    model, variables = out[0], out[1]
    psf_use = jnp.asarray(out[3] if len(out) > 3 and out[3] is not None else psf)

    @jax.jit
    def forward(data, background):
        kwargs = {}
        if background is not None:
            kwargs["background"] = background
        return model.apply(variables, data, psf_use, **kwargs)

    def recon(lensless, background=None):
        data = jnp.asarray(lensless)
        bg = jnp.asarray(background) if background is not None else None
        return forward(data, bg)

    return recon


def timed_apply(recon, lensless, n_trials: int = 1, background=None):
    """(result, avg_ms): run once to compile, then time n_trials
    dispatches with block_until_ready (reference's start/end loop,
    diffusercam_mirflickr.py:65-78 — torch.no_grad is a no-op here;
    nothing traces gradients outside jax.grad)."""
    import jax

    res = jax.block_until_ready(recon(lensless, background))
    t0 = time.time()
    for _ in range(n_trials):
        res = jax.block_until_ready(recon(lensless, background))
    avg_ms = (time.time() - t0) / max(n_trials, 1) * 1000
    print(f"Avg inference [ms] : {avg_ms:.3f} ms")
    return res, avg_ms


def alignment_crop(img2d, alignment: dict | None):
    """Crop a (H, W, C) reconstruction to the display alignment window."""
    if not alignment:
        return img2d
    top_left = alignment["top_left"]
    h = alignment.get("height")
    w = alignment.get("width")
    if h is None and "dim" in alignment:
        h, w = alignment["dim"]
    if w is None and h is not None:
        w = int(h * img2d.shape[1] / img2d.shape[0])
    return img2d[top_left[0]: top_left[0] + h, top_left[1]: top_left[1] + w]


def save_outputs(run_dir, model_name, idx, res, lensless, lensed=None,
                 alignment=None, psf=None, background=None):
    """Save the reconstruction (alignment-cropped), raw measurement and
    ground truth like the reference scripts do in the hydra run dir."""
    from lenslesspicam_tpu.data.io import save_image

    img = np.asarray(res)
    while img.ndim > 3:
        img = img[0]
    out_fp = os.path.join(run_dir, f"{model_name}_idx{idx}.png")
    save_image(alignment_crop(img, alignment), out_fp)
    files = [out_fp]
    if lensed is not None:
        fp = os.path.join(run_dir, f"original_idx{idx}.png")
        save_image(np.asarray(lensed).squeeze(), fp)
        files.append(fp)
    raw = np.asarray(lensless)
    while raw.ndim > 3:
        raw = raw[0]
    fp = os.path.join(run_dir, f"lensless_idx{idx}.png")
    save_image(raw, fp)
    files.append(fp)
    if psf is not None:
        fp = os.path.join(run_dir, "psf.png")
        save_image(np.asarray(psf).squeeze(), fp)
        files.append(fp)
    if background is not None:
        bg = np.asarray(background)
        while bg.ndim > 3:
            bg = bg[0]
        fp = os.path.join(run_dir, f"background_idx{idx}.png")
        save_image(bg, fp)
        files.append(fp)
    print(f"saved: {', '.join(files)}")
    return files
