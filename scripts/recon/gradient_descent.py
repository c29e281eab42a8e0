"""Projected gradient descent / FISTA reconstruction CLI
(reference: scripts/recon/gradient_descent.py; supports 3-D PSFs)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from lenslesspicam_tpu.utils.config import config_main

_CONFIG = os.path.join(os.path.dirname(__file__), "..", "..", "configs", "recon.yaml")


@config_main(_CONFIG)
def main(config):
    from lenslesspicam_tpu import FISTA, GradientDescent, NesterovGradientDescent
    from lenslesspicam_tpu.data.io import load_data, save_image

    assert config.input.psf and config.input.data

    psf, data = load_data(
        config.input.psf, config.input.data,
        downsample=config.preprocess.downsample,
        flip=config.preprocess.flip, gray=config.preprocess.gray,
        use_3d=str(config.input.psf).endswith((".npy", ".npz")),
    )
    method = config.gradient_descent.method
    cls = {"vanilla": GradientDescent, "nesterov": NesterovGradientDescent,
           "fista": FISTA}[method]
    recon = cls(psf)
    recon.set_data(data)
    t0 = time.time()
    res = np.asarray(recon.apply(n_iter=config.gradient_descent.n_iter))
    print(f"{method} recon: {time.time() - t0:.3f} s")
    if config.save:
        save_image(res[0], os.path.join(config.run_dir, "reconstruction.png"))
    return res


if __name__ == "__main__":
    main()
