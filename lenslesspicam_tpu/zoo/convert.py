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

    # with concatenate_compensation the body prepends a conv+ReLU at
    # m_body.0 and the ResBlocks shift by one (network_unet.py:178-186)
    off = 0
    if "m_body.0.weight" in state_dict:
        params["body_concat_conv"] = {"kernel": _conv_w(get("m_body.0.weight"))}
        # B.sequential flattens conv+ReLU, so ResBlocks start at index 2
        off = 2
    for j in range(nb):
        params[f"body_res{j}"] = {
            "conv1": {"kernel": _conv_w(get(f"m_body.{j + off}.res.0.weight"))},
            "conv2": {"kernel": _conv_w(get(f"m_body.{j + off}.res.2.weight"))},
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


def _get_np(state_dict, key):
    w = state_dict[key]
    return np.asarray(w.numpy() if hasattr(w, "numpy") else w)


def _double_conv(state_dict, prefix):
    """torch DoubleConv (multi_wiener.py:18-35: conv/BN/ReLU x2, conv at
    flattened indices 0/3, BN at 1/4) -> flax params + batch_stats."""

    def bn(idx):
        return (
            {"scale": _get_np(state_dict, f"{prefix}.{idx}.weight"),
             "bias": _get_np(state_dict, f"{prefix}.{idx}.bias")},
            {"mean": _get_np(state_dict, f"{prefix}.{idx}.running_mean"),
             "var": _get_np(state_dict, f"{prefix}.{idx}.running_var")},
        )

    bn0_p, bn0_s = bn(1)
    bn1_p, bn1_s = bn(4)
    params = {
        "Conv_0": {"kernel": _conv_w(_get_np(state_dict, f"{prefix}.0.weight"))},
        "BatchNorm_0": bn0_p,
        "Conv_1": {"kernel": _conv_w(_get_np(state_dict, f"{prefix}.3.weight"))},
        "BatchNorm_1": bn1_p,
    }
    stats = {"BatchNorm_0": bn0_s, "BatchNorm_1": bn1_s}
    return params, stats


def torch_multiwiener_to_flax(state_dict, nc=(64, 128, 256, 512, 512)) -> dict:
    """Map a reference MultiWiener state dict (multi_wiener.py:87-296)
    to flax variables for models.multi_wiener.MultiWiener — incl. the
    'avgpool_conv' -> 'pool_conv' hotfix rename (model_dict.py:545-549).
    Returns {'params': ..., 'batch_stats': ...}."""
    sd = {k.replace("avgpool_conv", "pool_conv"): v
          for k, v in state_dict.items()}
    n = len(nc)
    params: dict = {}
    stats: dict = {}

    def put(name, prefix):
        params[name], stats[name] = _double_conv(sd, prefix)

    put("inc", "inc.double_conv")
    put("inc0", "inc0.double_conv")
    for i in range(n - 1):
        p, s = _double_conv(sd, f"down_layers.{i}.pool_conv.1.double_conv")
        params[f"down{i}"] = {"DoubleConv_0": p}
        stats[f"down{i}"] = {"DoubleConv_0": s}
    for i in range(n - 2):
        p, s = _double_conv(sd, f"psf_down.{i}.pool_conv.1.double_conv")
        params[f"psf_down{i}"] = {"DoubleConv_0": p}
        stats[f"psf_down{i}"] = {"DoubleConv_0": s}
    for i in range(n - 1):
        p, s = _double_conv(sd, f"up_layers.{i}.conv.double_conv")
        params[f"up{i}"] = {"DoubleConv_0": p}
        stats[f"up{i}"] = {"DoubleConv_0": s}
    params["outc"] = {"kernel": _conv_w(_get_np(sd, "outc.conv.weight")),
                      "bias": _get_np(sd, "outc.conv.bias")}
    params["delta"] = _get_np(sd, "delta")
    # torch w is (1, psf_channels, 1, 1); flax (1, 1, 1, psf_channels)
    params["w"] = np.transpose(_get_np(sd, "w"), (0, 2, 3, 1))
    return {"params": params, "batch_stats": stats}


def torch_compensation_to_flax(state_dict, nc) -> dict:
    """Map a reference CompensationBranch state dict (recon/utils.py:84-175)
    to flax variables for models.compensation.CompensationBranch.

    branch_layers.{i} are double_cnn_max_pool Sequentials (conv at
    flattened index 0/3, BN at 1/4 — utils.py:30-52); residual_layers.{i}
    are ResBlocks whose conv stack lives under ``.double_conv``
    (utils.py:55-81).  Returns {'params', 'batch_stats'}."""
    n = len(nc)
    params: dict = {}
    stats: dict = {}
    for i in range(n):
        p, s = _double_conv(state_dict, f"branch_layers.{i}")
        params[f"branch{i}"] = p
        stats[f"branch{i}"] = s
    for i in range(n - 1):
        p, s = _double_conv(state_dict, f"residual_layers.{i}.double_conv")
        params[f"res{i}"] = {"_DoubleConvPool_0": p}
        stats[f"res{i}"] = {"_DoubleConvPool_0": s}
    return {"params": params, "batch_stats": stats}


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


def torch_restormer_to_flax(state_dict) -> dict:
    """Map a reference Restormer state dict (restormer.py:246-431) to
    flax params for models.restormer.Restormer.  Torch sequential
    indices become the flax block suffix (``encoder_level1.0`` ->
    ``encoder_level1_0``); layernorm ``.body.weight`` -> ``scale``;
    conv weights are (O, I, H, W) -> (H, W, I, O)."""
    _SEQ = ("encoder_level1", "encoder_level2", "encoder_level3", "latent",
            "decoder_level1", "decoder_level2", "decoder_level3",
            "refinement")
    params: dict = {}

    def put(path, val):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = val

    for key, w in state_dict.items():
        v = _get_np(state_dict, key)
        parts = key.split(".")
        if parts[0] in _SEQ:
            parts = [f"{parts[0]}_{parts[1]}"] + parts[2:]
        elif parts[0] == "patch_embed":           # patch_embed.proj.weight
            put(["patch_embed", "kernel"], _conv_w(v))
            continue
        elif parts[0].startswith(("down", "up")):  # downX_Y.body.0.weight
            put([parts[0], "kernel"], _conv_w(v))
            continue
        elif parts[0].startswith("reduce_chan") or parts[0] == "output":
            put([parts[0], "kernel" if parts[-1] == "weight" else "bias"],
                _conv_w(v) if parts[-1] == "weight" else v)
            continue
        # transformer-block internals
        if parts[-2] == "body":                    # normN.body.weight/bias
            put(parts[:-2] + ["scale" if parts[-1] == "weight" else "bias"], v)
        elif parts[-1] == "temperature":
            put(parts, v)
        elif parts[-1] == "weight":
            put(parts[:-1] + ["kernel"], _conv_w(v))
        else:                                      # conv bias
            put(parts, v)
    return {"params": params}
