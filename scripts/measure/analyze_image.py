"""Analyze a captured image: histograms, cross sections, autocorrelation
(reference: scripts/measure/analyze_image.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from lenslesspicam_tpu.utils.config import config_main

_DEFAULTS = {"fp": None, "bayer": False, "gamma": None, "output_dir": "outputs"}


@config_main(None)
def main(config):
    for key, val in _DEFAULTS.items():
        config.setdefault(key, val)
    from lenslesspicam_tpu.data.io import load_image
    from lenslesspicam_tpu.utils import plot as P

    assert config["fp"], "set fp=<image path>"
    img = load_image(config["fp"], bayer=config["bayer"], return_float=True)

    fig, axes = plt.subplots(2, 2, figsize=(12, 10))
    P.plot_image(img[None] if img.ndim == 3 else img, ax=axes[0, 0],
                 gamma=config["gamma"])
    P.pixel_histogram((img * 255).astype(np.uint8), ax=axes[0, 1], nbits=8)
    P.plot_cross_section(img, ax=axes[1, 0])
    P.plot_autocorr2d(img.mean(axis=-1) if img.ndim == 3 else img, ax=axes[1, 1])
    out = os.path.join(config["run_dir"], "analysis.png")
    fig.savefig(out)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
