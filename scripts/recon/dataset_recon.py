"""Reconstruct samples from a registered dataset with a classical solver
or a zoo model (reference: scripts/recon/diffusercam_mirflickr.py,
digicam.py, multilens_ambient.py — per-camera variants unified).

    python scripts/recon/dataset_recon.py dataset=diffusercam_mirflickr \
        algo=admm n_iter=100 n_files=4
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from lenslesspicam_tpu.utils.config import config_main

_DEFAULTS = {
    "dataset": None,          # registered HF dataset name
    "split": "test",
    "downsample": 2,
    "algo": "admm",           # admm | fista | hf:<camera>:<dataset>:<model>
    "n_iter": 100,
    "n_files": 4,
    "save": True,
    "output_dir": "outputs",
}


@config_main(None)
def main(config):
    for k, v in _DEFAULTS.items():
        config.setdefault(k, v)
    from lenslesspicam_tpu import ADMM, FISTA
    from lenslesspicam_tpu.data.datasets import get_dataset
    from lenslesspicam_tpu.data.io import save_image
    from lenslesspicam_tpu.eval.metrics import compute_metrics

    assert config["dataset"], "set dataset=<registered name>"
    ds = get_dataset(config["dataset"], split=config["split"],
                     downsample=config["downsample"])
    psf = ds.psf

    algo = config["algo"]
    if algo.startswith("hf:"):
        from lenslesspicam_tpu.zoo.model_dict import download_model, load_model

        _, camera, dsname, model_name = algo.split(":")
        path = download_model(camera, dsname, model_name)
        model, variables, _ = load_model(path, psf)
        import jax.numpy as jnp

        def reconstruct(lensless):
            return model.apply(variables, jnp.asarray(lensless), jnp.asarray(psf))
    else:
        solver = {"admm": ADMM, "fista": FISTA}[algo](psf)

        def reconstruct(lensless):
            return solver.batch_apply(lensless, n_iter=config["n_iter"])

    times = []
    for i in range(min(config["n_files"], len(ds))):
        lensless, lensed = ds[i]
        t0 = time.time()
        rec = np.asarray(reconstruct(lensless[None]))
        times.append(time.time() - t0)
        metrics = {k: float(v) for k, v in
                   compute_metrics(rec, np.asarray(lensed)[None]).items()}
        print(f"[{i}] {times[-1] * 1000:.1f} ms  {metrics}")
        if config["save"]:
            save_image(rec[0], os.path.join(config["run_dir"], f"recon_{i}.png"))
            save_image(lensed, os.path.join(config["run_dir"], f"lensed_{i}.png"))
    print(f"avg inference: {np.mean(times[1:]) * 1000:.1f} ms"
          if len(times) > 1 else "")


if __name__ == "__main__":
    main()
