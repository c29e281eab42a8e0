"""Downstream ViT classification on lensless reconstructions
(reference: scripts/classify/train_celeba_vit.py).

Fine-tunes a HF transformers ViT on reconstructed (or raw/lensed)
CelebA images for attribute classification — demonstrating task
performance of the reconstructions.  Requires network access for the
pretrained ViT and the dataset.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from lenslesspicam_tpu.utils.config import config_main

_DEFAULTS = {
    "data_dir": None,          # folder with images + labels.npy
    "attribute": "Male",
    "model_name": "google/vit-base-patch16-224-in21k",
    "epochs": 3,
    "batch_size": 16,
    "lr": 2e-4,
    "output_dir": "outputs",
}


@config_main(None)
def main(config):
    for key, val in _DEFAULTS.items():
        config.setdefault(key, val)
    try:
        from transformers import FlaxViTForImageClassification
    except ImportError as e:
        raise ImportError("requires `transformers` with flax support") from e

    import glob

    import jax
    import jax.numpy as jnp
    import optax

    from lenslesspicam_tpu.data.io import load_image

    assert config["data_dir"], "set data_dir with images + labels.npy"
    files = sorted(glob.glob(os.path.join(config["data_dir"], "*.png")))
    labels = np.load(os.path.join(config["data_dir"], "labels.npy"))
    assert len(files) == len(labels)

    model = FlaxViTForImageClassification.from_pretrained(
        config["model_name"], num_labels=2
    )
    params = model.params
    tx = optax.adamw(float(config["lr"]))
    opt_state = tx.init(params)

    def prep(fp):
        img = load_image(fp, return_float=True, shape=(224, 224, 3))
        return np.transpose(img, (2, 0, 1))  # ViT expects CHW

    @jax.jit
    def step(params, opt_state, pixel_values, y):
        def loss_fn(p):
            logits = model(pixel_values=pixel_values, params=p).logits
            return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    bs = config["batch_size"]
    for epoch in range(config["epochs"]):
        losses = []
        for i in range(0, len(files), bs):
            batch = jnp.asarray(np.stack([prep(f) for f in files[i : i + bs]]))
            y = jnp.asarray(labels[i : i + bs])
            params, opt_state, loss = step(params, opt_state, batch, y)
            losses.append(float(loss))
        print(f"epoch {epoch}: loss {np.mean(losses):.4f}")
    return params


if __name__ == "__main__":
    main()
