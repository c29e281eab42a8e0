"""Pretrained DigiCam inference with timing and alignment crop
(reference: scripts/recon/digicam.py).

    python scripts/recon/digicam.py model=U10 dataset=mirflickr_single_25k \
        idx=0 n_trials=10

``model=admm`` runs classical ADMM using a trained checkpoint's dataset
config.  ``fn=<file.png>`` reconstructs a raw measurement from the HF
dataset repo instead of a test-set sample.
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

    from _pretrained import (build_recon, build_test_set, load_bundle,
                             save_outputs, timed_apply)

    model_name = config.model or "admm"
    dataset = config.dataset or "mirflickr_single_25k"
    model_path, model_config = load_bundle(
        "digicam", dataset, model_name, local_model_dir=config.cache_dir,
        model_path=config.get("model_path"))

    test_set = build_test_set(model_config, cache_dir=config.cache_dir)
    psf = test_set.psf
    print("Test set size: ", len(test_set))

    if config.get("fn"):
        # raw measurement straight from the dataset repo
        from huggingface_hub import hf_hub_download

        from lenslesspicam_tpu.data.io import load_image

        fp = hf_hub_download(repo_id=model_config["files"]["dataset"],
                             filename=config.fn, repo_type="dataset")
        lensless = load_image(fp, return_float=True, as_4d=True)
        if config.get("rotate"):
            lensless = np.rot90(lensless, k=2, axes=(-3, -2)).copy()
        lensed = None
        idx = os.path.basename(fp).split("_")[0]
    else:
        idx = config.idx
        lensless, lensed = test_set[idx][:2]
        lensless = np.asarray(lensless)

    print(f"Data shape :  {lensless.shape}")
    recon = build_recon(model_name, model_path, psf, n_iter=config.n_iter)
    res, avg_ms = timed_apply(recon, lensless[None], n_trials=config.n_trials)

    if config.save:
        save_outputs(config.run_dir, model_name, idx, res, lensless, lensed,
                     alignment=getattr(test_set, "alignment", None), psf=psf)
    return res, avg_ms


if __name__ == "__main__":
    main()
