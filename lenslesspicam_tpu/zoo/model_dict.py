"""Model zoo: registry of published pretrained models + loading.

Re-design of lensless/recon/model_dict.py:28-563.  The registry maps
camera -> dataset -> model name -> HF repo (a representative subset of
the reference's ~150 entries; same naming grammar, documented in the
reference's configs/benchmark/README.md:18-24):

    [Unet{X}M+]  pre-processor UNetRes of ~X M params
    U{N}         unrolled ADMM with N iterations
    TrainInv     FlatNet trainable inversion
    MWDN{X}M     multi-Wiener deconvolution network
    MMCN         compensation-branch network
    [+Unet{X}M]  post-processor
    _psfNN       PSF-correction network

``parse_model_name`` turns a name into an architecture spec;
``build_model`` constructs the flax TrainableRecon; ``download_model``
fetches a checkpoint from HF (network-gated); ``load_model`` rebuilds
the exact architecture from the checkpoint's embedded Hydra config and
converts the torch weights (zoo/convert.py).
"""

from __future__ import annotations

import os
import re

model_dict = {
    "diffusercam": {
        "mirflickr": {
            "U20": "bezzam/diffusercam-mirflickr-unrolled-admm20",
            "Unet+U20": "bezzam/diffusercam-mirflickr-unet2-unrolled-admm20",
            "U20+Unet": "bezzam/diffusercam-mirflickr-unrolled-admm20-unet2",
            "U20+Drunet": "bezzam/diffusercam-mirflickr-unrolled-admm20-drunet",
            "TrainInv+Unet8M": "bezzam/diffusercam-mirflickr-trainable-inv-unet8M",
            "Unet4M+U5+Unet4M": "bezzam/diffusercam-mirflickr-unet4M-unrolled-admm5-unet4M",
            "MWDN8M": "bezzam/diffusercam-mirflickr-mwdn-8M",
            "Unet2M+MWDN6M": "bezzam/diffusercam-mirflickr-unet2M-mwdn-6M",
            "Unet4M+TrainInv+Unet4M": "bezzam/diffusercam-mirflickr-unet4M-trainable-inv-unet4M",
            "MMCN4M+Unet4M": "bezzam/diffusercam-mirflickr-mmcn-unet4M",
            "U5+Unet8M": "bezzam/diffusercam-mirflickr-unrolled-admm5-unet8M",
            "Unet8M+U5": "bezzam/diffusercam-mirflickr-unet8M-unrolled-admm5",
            "Unet4M+U20+Unet4M": "bezzam/diffusercam-mirflickr-unet4M-unrolled-admm20-unet4M",
            "Unet4M+U10+Unet4M": "bezzam/diffusercam-mirflickr-unet4M-unrolled-admm10-unet4M",
            "Unet4M+U5+Unet4M_psfNN": "bezzam/diffusercam-mirflickr-unet4M-unrolled-admm5-unet4M-psfNN",
        },
    },
    "digicam": {
        "mirflickr_single_25k": {
            "U5+Unet8M_wave": "bezzam/digicam-mirflickr-single-25k-unrolled-admm5-unet8M-wave",
            "Unet8M+U5_wave": "bezzam/digicam-mirflickr-single-25k-unet8M-unrolled-admm5-wave",
            "Unet4M+U5+Unet4M_wave": "bezzam/digicam-mirflickr-single-25k-unet4M-unrolled-admm5-unet4M-wave",
            "TrainInv+Unet8M_wave": "bezzam/digicam-mirflickr-single-25k-trainable-inv-unet8M-wave",
            "Unet4M+TrainInv+Unet4M_wave": "bezzam/digicam-mirflickr-single-25k-unet4M-trainable-inv-unet4M-wave",
            "Unet4M+U5+Unet4M_wave_psfNN": "bezzam/digicam-mirflickr-single-25k-unet4M-unrolled-admm5-unet4M-wave-psfNN",
        },
        "mirflickr_multi_25k": {
            "Unet4M+U5+Unet4M_wave": "bezzam/digicam-mirflickr-multi-25k-unet4M-unrolled-admm5-unet4M-wave",
            "Unet4M+U5+Unet4M_wave_psfNN": "bezzam/digicam-mirflickr-multi-25k-unet4M-unrolled-admm5-unet4M-wave-psfNN",
        },
        "celeba_26k": {
            "U5+Unet8M_wave": "bezzam/digicam-celeba-unrolled-admm5-unet8M",
            "Unet4M+U5+Unet4M_wave": "bezzam/digicam-celeba-unet4M-unrolled-admm5-unet4M",
            "TrainInv+Unet8M_wave": "bezzam/digicam-celeba-trainable-inv-unet8M",
        },
    },
    "tapecam": {
        "mirflickr": {
            "U5+Unet8M": "bezzam/tapecam-mirflickr-unrolled-admm5-unet8M",
            "Unet4M+U5+Unet4M": "bezzam/tapecam-mirflickr-unet4M-unrolled-admm5-unet4M",
            "TrainInv+Unet8M": "bezzam/tapecam-mirflickr-trainable-inv-unet8M",
            "Unet4M+TrainInv+Unet4M": "bezzam/tapecam-mirflickr-unet4M-trainable-inv-unet4M",
            "Unet4M+U5+Unet4M_psfNN": "bezzam/tapecam-mirflickr-unet4M-unrolled-admm5-unet4M-psfNN",
        },
    },
    "multilens": {
        "mirflickr_ambient": {
            "Unet4M+U10+Unet4M": "Lensless/multilens-mirflickr-ambient-unet4M-unrolled-admm10-unet4M",
            "Unet4M+U10+Unet4M_psfNN": "Lensless/multilens-mirflickr-ambient-unet4M-unrolled-admm10-unet4M-psfNN",
        },
    },
}

# UNetRes channel plans sized to approximate parameter budgets
# (reference train configs; e.g. Unet4M ~ nc=[32,64,116,128])
_UNET_NC = {
    None: (32, 64, 112, 128),
    "2": (16, 32, 64, 128),
    "2M": (23, 46, 92, 128),
    "4M": (32, 64, 116, 128),
    "6M": (44, 88, 176, 222),
    "8M": (51, 102, 204, 256),
}


def parse_model_name(name: str) -> dict:
    """Parse the model-name grammar into an architecture spec."""
    spec = {
        "pre": None, "post": None, "inversion": None, "n_iter": 5,
        "psf_network": False, "mwdn": None, "compensation": False,
    }
    base = name.split("_")[0]
    spec["psf_network"] = "psfNN" in name
    parts = base.split("+")
    seen_inv = False
    for part in parts:
        m_unet = re.fullmatch(r"Unet(\d+M?)?", part)
        m_u = re.fullmatch(r"U(\d+)", part)
        m_mwdn = re.fullmatch(r"MWDN(\d+M?)?", part)
        m_mmcn = re.fullmatch(r"MMCN(\d+M?)?", part)
        if m_u:
            spec["inversion"] = "unrolled_admm"
            spec["n_iter"] = int(m_u.group(1))
            seen_inv = True
        elif part == "TrainInv":
            spec["inversion"] = "trainable_inversion"
            seen_inv = True
        elif m_mwdn:
            spec["inversion"] = "multi_wiener"
            spec["mwdn"] = m_mwdn.group(1)
            seen_inv = True
        elif m_mmcn:
            spec["compensation"] = True
            seen_inv = True
        elif m_unet or part == "Drunet":
            key = "post" if seen_inv else "pre"
            spec[key] = m_unet.group(1) if m_unet else "drunet"
        else:
            raise ValueError(f"cannot parse model component: {part!r}")
    return spec


def build_model(name: str, nb: int = 4):
    """Construct the flax model for a zoo name (untrained)."""
    from ..models.trainable_recon import TrainableRecon
    from ..models.unet import UNetRes
    from ..models.unrolled import UnrolledADMM
    from ..models.inversion import TrainableInversion
    from ..models.multi_wiener import MultiWiener

    spec = parse_model_name(name)

    def unet(size):
        if size is None:
            return None
        nc = _UNET_NC.get(size if size != "drunet" else None, _UNET_NC[None])
        return UNetRes(out_nc=3, nc=nc, nb=nb)

    if spec["inversion"] == "multi_wiener":
        return MultiWiener(in_channels=3, out_channels=3)

    inversion = None
    if spec["inversion"] == "unrolled_admm":
        inversion = UnrolledADMM(n_iter=spec["n_iter"])
    elif spec["inversion"] == "trainable_inversion":
        inversion = TrainableInversion()

    return TrainableRecon(
        camera_inversion=inversion,
        pre_process=unet(spec["pre"]),
        post_process=unet(spec["post"]),
        psf_network=unet("4M") if spec["psf_network"] else None,
        skip_unrolled=inversion is None,
    )


def download_model(camera: str, dataset: str, model: str, local_model_dir=None):
    """snapshot_download of a pretrained checkpoint (model_dict.py:248-279);
    requires network access."""
    from huggingface_hub import snapshot_download

    repo_id = model_dict[camera][dataset][model]
    return snapshot_download(repo_id=repo_id, cache_dir=local_model_dir)


def load_model(model_path: str, psf=None, verbose: bool = False):
    """Rebuild a model from a reference checkpoint folder: read the
    embedded Hydra config (model_dict.py:309-311), build the flax
    architecture, convert the torch weights (zoo/convert.py).

    Supports the main published family: UnrolledADMM inversion with
    UNetRes pre/post processors (+ optional PSF network).
    """
    import glob

    import numpy as np
    import yaml

    from .convert import torch_unetres_to_flax, torch_unrolled_admm_params

    cfg_path = os.path.join(model_path, ".hydra", "config.yaml")
    assert os.path.isfile(cfg_path), f"no embedded config at {cfg_path}"
    with open(cfg_path) as f:
        config = yaml.safe_load(f)

    ckpts = sorted(glob.glob(os.path.join(model_path, "recon_epoch*")))
    assert ckpts, f"no checkpoint in {model_path}"
    best = [c for c in ckpts if "BEST" in c]
    ckpt = best[0] if best else ckpts[-1]

    import torch

    sd = torch.load(ckpt, map_location="cpu")
    # DataParallel unwrap (model_dict.py:235-245)
    sd = {k.replace("module.", ""): v for k, v in sd.items()}

    recon_cfg = config.get("reconstruction", {})
    method = recon_cfg.get("method", "unrolled_admm")
    n_iter = recon_cfg.get("unrolled_admm", {}).get("n_iter", 5)

    from ..models.trainable_recon import TrainableRecon
    from ..models.unet import UNetRes
    from ..models.unrolled import UnrolledADMM

    def proc_cfg(key):
        sub = recon_cfg.get(key, {}) or {}
        if sub.get("network") in ("UnetRes", "DruNet"):
            return tuple(sub.get("nc") or _UNET_NC[None]), sub.get("depth", 4)
        return None

    pre = proc_cfg("pre_process")
    post = proc_cfg("post_process")

    model = TrainableRecon(
        camera_inversion=UnrolledADMM(n_iter=n_iter),
        pre_process=UNetRes(out_nc=3, nc=pre[0], nb=pre[1]) if pre else None,
        post_process=UNetRes(out_nc=3, nc=post[0], nb=post[1]) if post else None,
    )

    params: dict = {}
    admm_keys = {k: v for k, v in sd.items() if k.startswith("_mu") or k.startswith("_tau")}
    if admm_keys:
        params["camera_inversion"] = torch_unrolled_admm_params(admm_keys)["params"]
    for torch_prefix, flax_name in (("pre_process_model.", "pre_block"),
                                    ("post_process_model.", "post_block")):
        sub_sd = {k[len(torch_prefix):]: v for k, v in sd.items()
                  if k.startswith(torch_prefix)}
        if sub_sd:
            nb = (pre if flax_name == "pre_block" else post)[1]
            net = torch_unetres_to_flax(sub_sd, nb=nb)["params"]
            nl_key = ("pre_process_param" if flax_name == "pre_block"
                      else "post_process_param")
            params[flax_name] = {
                "net": net,
                "noise_level": np.asarray(sd[nl_key]) if nl_key in sd else np.ones(1),
            }
    if verbose:
        print(f"loaded {method} n_iter={n_iter} pre={pre} post={post}")
    return model, {"params": params}, config


def remove_data_parallel(state_dict):
    """Strip 'module.' prefixes (model_dict.py:235-245)."""
    return {k.replace("module.", ""): v for k, v in state_dict.items()}
