"""Render a dataset PSF as a viewable gamma-corrected PNG.

Accepts a local path or a HuggingFace dataset repo + filename.  When
the PSF is a stored mask pattern (.npy) it is first propagated to a PSF
through the AdafruitLCD simulation (config-driven, replacing the
reference's hardcoded per-dataset constants).

Example:
    python scripts/data/plot_psf.py psf=<psf.png> gamma=1.8
    python scripts/data/plot_psf.py repo_id=<hf repo> psf=mask_pattern.npy

Reference: scripts/data/plot_psf.py.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from lenslesspicam_tpu.utils.config import config_main

_DEFAULTS = {
    "repo_id": None,        # HF dataset repo (else psf is a local path)
    "psf": None,            # filename (in repo) or local path
    "downsample": 8,
    "gamma": 1.8,
    "flip_ud": False,
    "sim": {"scene2mask": 0.3, "mask2sensor": 0.002, "deadspace": True},
    "output_dir": "outputs",
}


@config_main(None)
def main(config):
    for k, v in _DEFAULTS.items():
        if isinstance(v, dict):
            config.setdefault(k, {})
            for kk, vv in v.items():
                config[k].setdefault(kk, vv)
        else:
            config.setdefault(k, v)
    from lenslesspicam_tpu.data.image import gamma_correction
    from lenslesspicam_tpu.data.io import load_psf, save_image

    psf_name = config["psf"]
    assert psf_name, "set psf=<path or repo filename>"
    if config["repo_id"]:
        from huggingface_hub import hf_hub_download

        psf_fp = hf_hub_download(repo_id=config["repo_id"],
                                 filename=psf_name, repo_type="dataset")
        base = os.path.basename(config["repo_id"])
    else:
        psf_fp = psf_name
        base = os.path.basename(psf_name).split(".")[0]
    assert os.path.exists(psf_fp), f"{psf_fp} not found"

    if psf_fp.endswith(".npy"):
        from lenslesspicam_tpu.hardware.trainable_mask import AdafruitLCD

        mask_vals = np.load(psf_fp)
        mask = AdafruitLCD(
            initial_vals=mask_vals.astype(np.float32),
            sensor="rpi_hq",
            downsample=int(config["downsample"]),
            flipud=bool(config["flip_ud"]),
            scene2mask=float(config["sim"]["scene2mask"]),
            mask2sensor=float(config["sim"]["mask2sensor"]),
            deadspace=bool(config["sim"]["deadspace"]),
        )
        psf = np.asarray(mask.get_psf(mask.params))
    else:
        psf = np.asarray(load_psf(psf_fp, downsample=int(config["downsample"]),
                                  flip_ud=bool(config["flip_ud"])))

    psf = psf / psf.max()
    if float(config["gamma"]) > 1:
        psf = gamma_correction(psf, gamma=float(config["gamma"]))

    fn = os.path.join(config["run_dir"], f"{base}_psf.png")
    save_image(np.squeeze(psf), fn)
    print(f"Saved PSF as {fn}")
    return fn


if __name__ == "__main__":
    main()
