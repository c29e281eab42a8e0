"""Prepare a subset of the DiffuserCam-MirFlickr dataset.

Shuffles the diffuser measurements, copies the first ``n_files``
(raw .npy + a postprocessed viewable .tif per file) together with their
lensed ground truths and the PSF into a timestamped subset directory.

    python scripts/data/prepare_mirflickr_subset.py data=<dataset dir>

Reference: scripts/data/prepare_mirflickr_subset.py.
"""

import glob
import os
import sys
from datetime import datetime
from shutil import copyfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from lenslesspicam_tpu.utils.config import config_main

_DEFAULTS = {"data": None, "n_files": 200, "seed": 11,
             "output_dir_path": None, "output_dir": "outputs"}


@config_main(None)
def subset_mirflickr(config):
    for k, v in _DEFAULTS.items():
        config.setdefault(k, v)
    from PIL import Image

    from lenslesspicam_tpu.recon.mirflickr import postprocess

    data = config["data"]
    assert data and os.path.isdir(data), "set data=<DiffuserCam dataset dir>"
    n_files = int(config["n_files"])
    seed = int(config["seed"])

    diffuser_dir = os.path.join(data, "dataset", "diffuser_images")
    lensed_dir = os.path.join(data, "dataset", "ground_truth_lensed")
    psf_path = os.path.join(data, "psf.tiff")

    timestamp = datetime.now().strftime("%d%m%Y_%Hh%M")
    output_dir_fn = f"DiffuserCam_Mirflickr_{n_files}_{timestamp}_seed{seed}"
    base = config["output_dir_path"] or config["run_dir"]
    output_dir = os.path.join(base, output_dir_fn)
    diffuser_out = os.path.join(output_dir, "diffuser")
    lensed_out = os.path.join(output_dir, "lensed")
    os.makedirs(diffuser_out)
    os.makedirs(lensed_out)
    print(f"Created output directory : {output_dir}")

    diffuser_files = glob.glob(os.path.join(diffuser_dir, "*.npy"))
    np.random.seed(seed)
    np.random.shuffle(diffuser_files)
    subset = diffuser_files[:n_files]

    if os.path.exists(psf_path):
        copyfile(psf_path, os.path.join(output_dir, os.path.basename(psf_path)))
    for fn in subset:
        bn = os.path.basename(fn)
        copyfile(fn, os.path.join(diffuser_out, bn))
        image_data = (postprocess(np.load(fn)) * 255).astype(np.uint8)
        Image.fromarray(image_data).save(
            os.path.join(diffuser_out, bn.split(".")[0] + ".tif"))

        lensed_fp = os.path.join(lensed_dir, bn)
        copyfile(lensed_fp, os.path.join(lensed_out, bn))
        image_data = (postprocess(np.load(lensed_fp)) * 255).astype(np.uint8)
        Image.fromarray(image_data).save(
            os.path.join(lensed_out, bn.split(".")[0] + ".tif"))
    print(f"copied {len(subset)} pairs")
    return output_dir


if __name__ == "__main__":
    subset_mirflickr()
