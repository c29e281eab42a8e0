"""Simulate a lensless dataset from images + a PSF or mask design
(reference: scripts/sim/*.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from lenslesspicam_tpu.utils.config import config_main

_CONFIG = os.path.join(os.path.dirname(__file__), "..", "..", "configs", "simulate.yaml")


@config_main(_CONFIG)
def main(config):
    from lenslesspicam_tpu.data.datasets import simulate_dataset
    from lenslesspicam_tpu.data.io import load_psf, save_image

    psf = None
    if config.psf:
        psf = load_psf(config.psf, downsample=config.mask.downsample)
    elif config.mask.type:
        from lenslesspicam_tpu.hardware import mask as mask_mod

        cls = getattr(mask_mod, config.mask.type)
        m = cls.from_sensor(config.sensor, downsample=config.mask.downsample,
                            distance_sensor=float(config.mask.distance_sensor))
        psf = np.asarray(m.psf)[None]
        psf = psf / np.linalg.norm(psf)

    ds = simulate_dataset(
        {
            "dataset": config.dataset,
            "n_files": config.n_files,
            "object_height": config.object_height,
            "scene2mask": config.scene2mask,
            "mask2sensor": config.mask2sensor,
            "sensor": config.sensor,
            "snr_db": config.snr_db,
        },
        psf=psf,
    )

    save_dir = config.save_dir or os.path.join(config.run_dir, "dataset")
    os.makedirs(os.path.join(save_dir, "diffuser"), exist_ok=True)
    os.makedirs(os.path.join(save_dir, "lensed"), exist_ok=True)
    for i in range(len(ds)):
        lensless, lensed = ds[i]
        np.save(os.path.join(save_dir, "diffuser", f"im{i}.npy"), lensless)
        np.save(os.path.join(save_dir, "lensed", f"im{i}.npy"), lensed)
    if psf is not None:
        np.save(os.path.join(save_dir, "psf.npy"), np.asarray(psf))
    save_image(ds[0][0], os.path.join(config.run_dir, "example_lensless.png"))
    print(f"saved {len(ds)} pairs to {save_dir}")
    return save_dir


if __name__ == "__main__":
    main()
