"""Pretrained-model (or ADMM) inference on the HF-hosted DiffuserCam
dataset with average-latency timing
(reference: scripts/recon/diffusercam.py:1-100).

    python scripts/recon/diffusercam.py model=U10 idx=1 n_trials=10

Differs from diffusercam_mirflickr.py only in the data source: this
uses the registry's HF dataset (get_dataset) rather than a local
folder tree.  Requires network/cache access for dataset + checkpoint.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from lenslesspicam_tpu.utils.config import config_main

_DEFAULTS = {
    "model": "admm",         # zoo model name, or "admm"
    "idx": 0,
    "n_trials": 10,
    "n_iter": 100,           # for the admm fallback
    "save": True,
    "cache_dir": None,
    "output_dir": "outputs",
}


@config_main(None)
def main(config):
    from lenslesspicam_tpu.utils.config import apply_defaults

    apply_defaults(config, _DEFAULTS)
    import numpy as np

    from lenslesspicam_tpu.data.datasets import get_dataset
    from lenslesspicam_tpu.data.io import save_image

    dataset = get_dataset("diffusercam_mirflickr", split="test",
                          cache_dir=config["cache_dir"])
    psf = np.asarray(dataset.psf)
    print("Test set size:", len(dataset))
    lensless, lensed = dataset[config["idx"]][:2]
    print("Data shape:", np.asarray(lensless).shape)

    if config["model"] == "admm":
        from lenslesspicam_tpu import ADMM

        recon = ADMM(psf, n_iter=config["n_iter"])
    else:
        from lenslesspicam_tpu.zoo.model_dict import download_model, load_model

        path = download_model(camera="diffusercam", dataset="mirflickr",
                              model=config["model"],
                              local_model_dir=config["cache_dir"])
        recon = load_model(path, psf)

    t0 = time.time()
    for _ in range(config["n_trials"]):
        if hasattr(recon, "set_data"):
            recon.set_data(np.asarray(lensless)[None])
            res = np.asarray(recon.apply())
        else:
            res = np.asarray(recon(np.asarray(lensless)[None]))
    avg_ms = (time.time() - t0) / config["n_trials"] * 1000
    print(f"Avg inference [ms] : {avg_ms:.2f} ms")

    if config["save"]:
        out = config["run_dir"]
        save_image(res[0], os.path.join(out, f"{config['model']}_"
                                        f"{config['idx']}.png"))
        save_image(np.asarray(lensless),
                   os.path.join(out, f"lensless_{config['idx']}.png"))
        if lensed is not None:
            save_image(np.asarray(lensed),
                       os.path.join(out, f"original_{config['idx']}.png"))
        print(f"Saved images to {out}")


if __name__ == "__main__":
    main()
