"""LPIPS (VGG16 backbone) in flax — perceptual metric/loss.

Replaces the reference's dependency on the ``lpips`` torch package
(lensless/eval/benchmark.py:144-146, recon/utils.py LPIPS loss).  The
VGG16 feature trunk and the per-layer 1x1 linear heads are implemented in
flax; pretrained weights must be supplied (this environment has no
network egress and no cached torchvision/lpips checkpoints):

* ``load_torch_lpips(path)`` converts a torch LPIPS state-dict (the
  ``lpips`` package format, incl. the embedded torchvision VGG16
  features) to flax params;
* ``random_params(key)`` yields randomly initialized params — only
  useful for tests and API plumbing, NOT a perceptual metric.

Architecture (Zhang et al. 2018): inputs in [0,1] are mapped to [-1,1],
shifted/scaled by the ImageNet statistics, passed through VGG16 conv
stages; features from relu1_2, relu2_2, relu3_3, relu4_3, relu5_3 are
channel-unit-normalized, squared-differenced, weighted by learned
non-negative 1x1 convs, spatially averaged, and summed.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, n_convs) per stage
_VGG_STAGES = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class _VGGFeatures(nn.Module):
    @nn.compact
    def __call__(self, x):
        feats = []
        for stage_idx, (ch, n_convs) in enumerate(_VGG_STAGES):
            for conv_idx in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=1, name=f"conv{stage_idx}_{conv_idx}")(x)
                x = nn.relu(x)
            feats.append(x)
            if stage_idx < len(_VGG_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    """``__call__(pred, target)`` on (B, H, W, 3) images in [0, 1]."""

    @nn.compact
    def __call__(self, pred: jax.Array, target: jax.Array) -> jax.Array:
        vgg = _VGGFeatures(name="vgg")

        def prep(img):
            img = 2.0 * img - 1.0  # torchmetrics normalize=True convention
            return (img - _SHIFT) / _SCALE

        f_pred = vgg(prep(pred))
        f_tgt = vgg(prep(target))

        total = 0.0
        for i, (fp, ft) in enumerate(zip(f_pred, f_tgt)):
            # unit-normalize exactly like lpips.normalize_tensor: the eps
            # guards the division OUTSIDE the sqrt
            fp = fp / (jnp.sqrt(jnp.sum(fp**2, axis=-1, keepdims=True)) + 1e-10)
            ft = ft / (jnp.sqrt(jnp.sum(ft**2, axis=-1, keepdims=True)) + 1e-10)
            diff = (fp - ft) ** 2
            w = self.param(f"lin{i}", nn.initializers.ones, (diff.shape[-1],))
            layer_val = jnp.mean(jnp.sum(jnp.abs(w) * diff, axis=-1), axis=(-1, -2))
            total = total + layer_val
        return total


def random_params(key, image_shape=(1, 64, 64, 3)):
    """Randomly initialized params (tests / plumbing only)."""
    model = LPIPS()
    dummy = jnp.zeros(image_shape, jnp.float32)
    return model.init(key, dummy, dummy)


def load_torch_lpips(path):
    """Convert a torch LPIPS(net='vgg') state dict to flax params.

    Accepts the ``lpips`` package checkpoint (lin heads) combined with a
    torchvision VGG16 features state dict, or a single merged dict. Keys:
    ``net.slice*``/``features.N.weight`` for convs, ``lin*.model.1.weight``
    for heads.
    """
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    # torchvision features index -> (stage, conv) mapping
    order = []
    idx = 0
    for stage_idx, (_, n_convs) in enumerate(_VGG_STAGES):
        for conv_idx in range(n_convs):
            order.append((idx, stage_idx, conv_idx))
            idx += 2  # conv + relu
        idx += 1  # maxpool

    params = {"vgg": {}}
    for feat_idx, stage_idx, conv_idx in order:
        w = None
        for key_fmt in (f"features.{feat_idx}.weight", f"net.features.{feat_idx}.weight"):
            if key_fmt in sd:
                w = sd[key_fmt].numpy()
                b = sd[key_fmt.replace("weight", "bias")].numpy()
        if w is None:
            raise KeyError(f"VGG conv features.{feat_idx} not found in checkpoint")
        params["vgg"][f"conv{stage_idx}_{conv_idx}"] = {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "bias": jnp.asarray(b),
        }
    for i in range(5):
        for key_fmt in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key_fmt in sd:
                params[f"lin{i}"] = jnp.asarray(sd[key_fmt].numpy().reshape(-1))
    return {"params": params}
