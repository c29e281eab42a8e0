"""torch -> flax weight conversion for reference checkpoints.

Converts the reference's torch UNetRes state dicts
(lensless/recon/drunet/network_unet.py, key layout ``m_head``,
``m_down{1..3}.{j}.res.{0,2}``, ``m_body.{j}``, ``m_up{3..1}``,
``m_tail``) into our flax UNetRes params (models/unet.py, explicit
layer names), enabling A/B validation against published HF models and
loading pretrained DruNet denoisers.

Conv2d weights (O, I, kH, kW) -> flax (kH, kW, I, O);
ConvTranspose2d weights (I, O, kH, kW) -> flax ConvTranspose
(kH, kW, I, O) with a spatial flip (torch's transposed conv correlates
where lax.conv_transpose convolves — verified by forward-parity test).
"""

from __future__ import annotations

import numpy as np


def _conv_w(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _convtranspose_w(w):
    # (I, O, kH, kW) -> (kH, kW, I, O), spatially flipped
    w = np.asarray(w)[:, :, ::-1, ::-1]
    return np.transpose(w, (2, 3, 0, 1))


def torch_unetres_to_flax(state_dict, nb: int = 4) -> dict:
    """Map a reference UNetRes state dict to flax params for
    models.unet.UNetRes(nb=nb)."""

    def get(key):
        w = state_dict[key]
        return w.numpy() if hasattr(w, "numpy") else np.asarray(w)

    params: dict = {"encoder": {}}
    enc = params["encoder"]
    enc["head"] = {"kernel": _conv_w(get("m_head.weight"))}
    for scale in range(3):
        tname = f"m_down{scale + 1}"
        for j in range(nb):
            enc[f"down{scale}_res{j}"] = {
                "conv1": {"kernel": _conv_w(get(f"{tname}.{j}.res.0.weight"))},
                "conv2": {"kernel": _conv_w(get(f"{tname}.{j}.res.2.weight"))},
            }
        enc[f"down{scale}_conv"] = {"kernel": _conv_w(get(f"{tname}.{nb}.weight"))}

    for j in range(nb):
        params[f"body_res{j}"] = {
            "conv1": {"kernel": _conv_w(get(f"m_body.{j}.res.0.weight"))},
            "conv2": {"kernel": _conv_w(get(f"m_body.{j}.res.2.weight"))},
        }

    for scale in range(3):
        tname = f"m_up{scale + 1}"
        params[f"up{scale}_conv"] = {"kernel": _convtranspose_w(get(f"{tname}.0.weight"))}
        for j in range(nb):
            params[f"up{scale}_res{j}"] = {
                "conv1": {"kernel": _conv_w(get(f"{tname}.{j + 1}.res.0.weight"))},
                "conv2": {"kernel": _conv_w(get(f"{tname}.{j + 1}.res.2.weight"))},
            }

    params["tail"] = {"kernel": _conv_w(get("m_tail.weight"))}

    if "subtraction_weights" in state_dict:
        params["subtraction_weights"] = np.asarray(get("subtraction_weights"))
        benc = params["encoder_background"] = {}
        benc["head"] = {"kernel": _conv_w(get("m_head_background.weight"))}
        for scale in range(3):
            tname = f"m_down{scale + 1}_background"
            for j in range(nb):
                benc[f"down{scale}_res{j}"] = {
                    "conv1": {"kernel": _conv_w(get(f"{tname}.{j}.res.0.weight"))},
                    "conv2": {"kernel": _conv_w(get(f"{tname}.{j}.res.2.weight"))},
                }
            benc[f"down{scale}_conv"] = {"kernel": _conv_w(get(f"{tname}.{nb}.weight"))}

    return {"params": params}


def torch_unet_to_flax(state_dict, nb: int = 2) -> dict:
    """Map a reference plain-UNet state dict (network_unet.py:22-100,
    flattened Sequential indices: conv+ReLU pairs at even indices) to
    flax params for models.unet.UNet(nb=nb)."""

    def get(key):
        w = state_dict[key]
        return np.asarray(w.numpy() if hasattr(w, "numpy") else w)

    def kb(prefix):
        return {"kernel": _conv_w(get(f"{prefix}.weight")),
                "bias": get(f"{prefix}.bias")}

    p: dict = {"head": kb("m_head.0")}
    for scale in range(3):
        t = f"m_down{scale + 1}"
        for j in range(nb):
            p[f"down{scale}_conv{j}"] = kb(f"{t}.{2 * j}")
        p[f"down{scale}_down"] = kb(f"{t}.{2 * nb}")
    for j in range(nb + 1):
        p[f"body_conv{j}"] = kb(f"m_body.{2 * j}")
    for scale in range(3):
        t = f"m_up{scale + 1}"
        p[f"up{scale}_up"] = {
            "kernel": _convtranspose_w(get(f"{t}.0.weight")),
            "bias": get(f"{t}.0.bias"),
        }
        for j in range(nb):
            p[f"up{scale}_conv{j}"] = kb(f"{t}.{2 * (j + 1)}")
    p["tail"] = kb("m_tail")
    return {"params": p}


def torch_unrolled_admm_params(state_dict) -> dict:
    """Map UnrolledADMM hyper-parameter vectors (unrolled_admm.py:83-94)."""

    def get(key):
        w = state_dict[key]
        return np.asarray(w.numpy() if hasattr(w, "numpy") else w)

    return {
        "params": {
            "mu1": get("_mu1_p"),
            "mu2": get("_mu2_p"),
            "mu3": get("_mu3_p"),
            "tau": get("_tau_p"),
        }
    }
