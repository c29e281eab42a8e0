"""Statistics over a measured dataset folder: saturation, exposure
levels (reference: scripts/measure/analyze_measured_dataset.py)."""

import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from lenslesspicam_tpu.utils.config import config_main

_DEFAULTS = {
    "folder": None,
    "ext": "png",
    "saturation_percent": 0.5,
    "n_files": None,
    "output_dir": "outputs",
}


@config_main(None)
def main(config):
    for k, v in _DEFAULTS.items():
        config.setdefault(k, v)
    from lenslesspicam_tpu.data.io import load_image

    assert config["folder"]
    files = sorted(glob.glob(os.path.join(config["folder"], f"*.{config['ext']}")))
    if config["n_files"]:
        files = files[: config["n_files"]]

    n_saturated = 0
    maxima, means = [], []
    for fp in files:
        img = load_image(fp)
        max_val = float(np.iinfo(img.dtype).max) if img.dtype.kind == "u" else 1.0
        frac = float((img >= max_val).mean() * 100)
        maxima.append(img.max() / max_val)
        means.append(img.mean() / max_val)
        if frac > config["saturation_percent"]:
            n_saturated += 1

    print(f"files          : {len(files)}")
    print(f"saturated      : {n_saturated} "
          f"(> {config['saturation_percent']}% clipped pixels)")
    print(f"max value      : mean {np.mean(maxima):.3f}, min {np.min(maxima):.3f}")
    print(f"mean intensity : {np.mean(means):.4f}")


if __name__ == "__main__":
    main()
