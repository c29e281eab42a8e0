"""Pretrained-model inference on DiffuserCam-MirFlickr with timing
(reference: scripts/recon/diffusercam_mirflickr.py).

    python scripts/recon/diffusercam_mirflickr.py model_name=U5+Unet8M \
        idx=3 n_trials=10

``model_name=admm`` (or null) runs classical ADMM instead of a learned
model.  Requires network/cache access for the HF dataset + checkpoint.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from lenslesspicam_tpu.utils.config import config_main

_CONFIG = os.path.join(os.path.dirname(__file__), "..", "..", "configs",
                       "recon_pretrained.yaml")


@config_main(_CONFIG)
def main(config):
    import numpy as np

    from _pretrained import build_recon, save_outputs, timed_apply
    from lenslesspicam_tpu.data.datasets import DiffuserCamMirflickr

    model_name = config.model_name or "admm"
    model_path = None
    if model_name != "admm":
        from _pretrained import load_bundle

        model_path, _ = load_bundle(
            "diffusercam", "mirflickr", model_name,
            local_model_dir=config.cache_dir,
            model_path=config.get("model_path"))

    dataset = DiffuserCamMirflickr(
        dataset_dir=config.files.dataset,
        psf_path=config.files.psf,
        downsample=config.files.downsample,
    )
    # reference keeps the first 1000 allowed files as the test split
    test_idx = [i for i in dataset.allowed_idx if i <= 1000]
    print("Test set size:", len(test_idx))

    lensless, lensed = dataset[test_idx[config.idx]]
    psf = dataset.psf
    print(f"Data shape :  {np.asarray(lensless).shape}")

    recon = build_recon(model_name, model_path, psf, n_iter=config.n_iter)
    res, avg_ms = timed_apply(recon, np.asarray(lensless)[None],
                              n_trials=config.n_trials)

    if config.save:
        save_outputs(config.run_dir, model_name, config.idx, res,
                     lensless, lensed)
    return res, avg_ms


if __name__ == "__main__":
    main()
