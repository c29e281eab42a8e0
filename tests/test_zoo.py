"""Model zoo: name grammar parsing + architecture construction."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lenslesspicam_tpu.zoo.model_dict import build_model, model_dict, parse_model_name


def test_parse_names():
    s = parse_model_name("Unet4M+U5+Unet4M_psfNN")
    assert s["pre"] == "4M" and s["post"] == "4M"
    assert s["inversion"] == "unrolled_admm" and s["n_iter"] == 5
    assert s["psf_network"]

    s = parse_model_name("TrainInv+Unet8M")
    assert s["inversion"] == "trainable_inversion" and s["post"] == "8M"

    s = parse_model_name("U20")
    assert s["n_iter"] == 20 and s["pre"] is None and s["post"] is None

    s = parse_model_name("MWDN8M")
    assert s["inversion"] == "multi_wiener"

    s = parse_model_name("Unet8M+U5")
    assert s["pre"] == "8M" and s["post"] is None


def test_registry_structure():
    assert "diffusercam" in model_dict
    for camera, datasets in model_dict.items():
        for ds, models in datasets.items():
            for name, repo in models.items():
                parse_model_name(name.replace("_wave", ""))  # all names parse
                assert "/" in repo


@pytest.mark.parametrize("name", ["U5", "TrainInv+Unet2M", "Unet2M+U5+Unet2M"])
def test_build_model_forward(name):
    rng = np.random.RandomState(0)
    psf = rng.rand(1, 24, 32, 3).astype(np.float32)
    psf /= np.linalg.norm(psf)
    data = jnp.asarray(rng.rand(1, 1, 24, 32, 3).astype(np.float32))
    model = build_model(name, nb=1)
    params = model.init(jax.random.PRNGKey(0), data, jnp.asarray(psf))
    out = model.apply(params, data, jnp.asarray(psf))
    assert out.shape == data.shape
