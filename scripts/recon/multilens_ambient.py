"""Pretrained multi-lens inference under ambient lighting, with
background subtraction (reference: scripts/recon/multilens_ambient.py).

    python scripts/recon/multilens_ambient.py model=U5+Unet8M idx=0 \
        background_sub=true n_trials=10

``fn=`` + ``background_fn=`` reconstruct a raw measurement/background
pair from the HF repo; otherwise the test-set sample's measured ambient
background is used.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from lenslesspicam_tpu.utils.config import config_main

_CONFIG = os.path.join(os.path.dirname(__file__), "..", "..", "configs",
                       "recon_pretrained.yaml")


def _load_raw(repo, fn, psf_shape):
    """Raw (unnormalized) measurement resized to the PSF grid."""
    from huggingface_hub import hf_hub_download

    from lenslesspicam_tpu.data.image import resize
    from lenslesspicam_tpu.data.io import load_image

    fp = fn if os.path.exists(fn) else hf_hub_download(
        repo_id=repo, filename=fn, repo_type="dataset")
    img = load_image(fp, return_float=True, as_4d=True, normalize=False)
    if img.shape[-3:-1] != tuple(psf_shape[-3:-1]):
        import numpy as np

        img = np.stack([resize(img[i], shape=psf_shape[-3:])
                        for i in range(img.shape[0])])
    return img


@config_main(_CONFIG)
def main(config):
    import numpy as np

    from _pretrained import (build_recon, build_test_set, load_bundle,
                             save_outputs, timed_apply)

    model_name = config.model or "admm"
    dataset = config.dataset or "mirflickr_ambient"
    model_path, model_config = load_bundle(
        "multilens", dataset, model_name, local_model_dir=config.cache_dir,
        model_path=config.get("model_path"))

    test_set = build_test_set(model_config, cache_dir=config.cache_dir)
    psf = np.asarray(test_set.psf)
    print("PSF shape: ", psf.shape)

    repo = model_config["files"]["dataset"]
    if config.get("fn"):
        lensless = _load_raw(repo, config.fn, psf.shape)
        if config.get("background_sub", True) and config.get("background_fn"):
            background = _load_raw(repo, config.background_fn, psf.shape)
        else:
            background = np.zeros_like(lensless)
        if config.get("rotate"):
            lensless = np.rot90(lensless, k=2, axes=(-3, -2)).copy()
            background = np.rot90(background, k=2, axes=(-3, -2)).copy()
        lensed = None
        idx = os.path.basename(config.fn).split(".")[0]
    else:
        idx = config.idx
        sample = test_set[idx]
        lensless, lensed = np.asarray(sample[0]), sample[1]
        background = np.asarray(sample[2]) if len(sample) > 2 else \
            np.zeros_like(lensless)

    # normalize measurement and background by the same factor
    # (multilens_ambient.py:141-144)
    max_val = max(float(np.max(lensless)), 1e-9)
    lensless = lensless / max_val
    background = background / max_val

    print(f"Data shape :  {lensless.shape}")
    recon = build_recon(model_name, model_path, psf, n_iter=config.n_iter)
    use_bg = config.get("background_sub", True)
    res, avg_ms = timed_apply(recon, lensless[None], n_trials=config.n_trials,
                              background=background[None] if use_bg else None)

    if config.save:
        save_outputs(config.run_dir, model_name, idx, res, lensless, lensed,
                     alignment=getattr(test_set, "alignment", None), psf=psf,
                     background=background)
    return res, avg_ms


if __name__ == "__main__":
    main()
