"""Compare a saved reconstruction (.npy) with the original image.

Extracts the matching region (crop + rotation via eval.metric.extract),
plots both side by side, and prints MSE/PSNR/SSIM (+LPIPS when weights
are available).

Reference: scripts/eval/compute_metrics_from_original.py.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from lenslesspicam_tpu.utils.config import config_main

_DEFAULTS = {
    "files": {"recon": None, "original": None},
    "alignment": {"vertical_crop": None, "horizontal_crop": None,
                  "rotation": 0},
    "verbose": True,
    "output_dir": "outputs",
}


@config_main(None)
def compute_metrics(config):
    for k, v in _DEFAULTS.items():
        if isinstance(v, dict):
            config.setdefault(k, {})
            for kk, vv in v.items():
                config[k].setdefault(kk, vv)
        else:
            config.setdefault(k, v)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from lenslesspicam_tpu.data.io import load_image
    from lenslesspicam_tpu.eval.metric import extract, lpips, mse, psnr, ssim
    from lenslesspicam_tpu.utils.plot import plot_image

    recon_fp = config["files"]["recon"]
    original_fp = config["files"]["original"]
    assert recon_fp and os.path.exists(recon_fp), "set files.recon=<npy>"
    assert original_fp and os.path.exists(original_fp), "set files.original=<img>"

    est = np.load(recon_fp)
    if config["verbose"]:
        print("estimate shape", est.shape)
    img = load_image(original_fp)
    img = img / img.max()

    al = config["alignment"]
    vc = tuple(int(v) for v in al["vertical_crop"]) if al["vertical_crop"] \
        else (0, est.shape[-3 if est.ndim > 2 else 0])
    hc = tuple(int(v) for v in al["horizontal_crop"]) if al["horizontal_crop"] \
        else (0, est.shape[-2 if est.ndim > 2 else 1])
    est, img_resize = extract(est, img, vc, hc, float(al["rotation"]),
                              verbose=config["verbose"])

    _, ax = plt.subplots(ncols=2, figsize=(10, 5))
    plot_image(est, ax=ax[0]).set_title("Reconstruction")
    plot_image(img_resize, ax=ax[1]).set_title("Original")

    print("\nMSE", float(mse(img_resize, est)))
    print("PSNR", float(psnr(img_resize, est)))
    channel_axis = 2 if np.squeeze(est).ndim == 3 else None
    print("SSIM", float(ssim(img_resize, est, channel_axis=channel_axis)))
    try:
        print("LPIPS", float(lpips(img_resize, est)))
    except Exception as e:
        print(f"LPIPS unavailable ({e})")

    save = os.path.join(config["run_dir"], "comparison.png")
    plt.savefig(save)
    print(f"Save comparison to {save}")


if __name__ == "__main__":
    compute_metrics()
