"""Weight conversion: torch reference UNetRes -> flax, forward parity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import reference_available, add_reference_to_path, stub_torchvision
from lenslesspicam_tpu.models.unet import UNetRes
from lenslesspicam_tpu.zoo.convert import torch_unetres_to_flax

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")


def test_unetres_conversion_forward_parity():
    add_reference_to_path()
    stub_torchvision()
    import torch
    from lensless.recon.drunet.network_unet import UNetRes as TorchUNetRes

    nc = [8, 16, 32, 64]
    nb = 2
    tmodel = TorchUNetRes(in_nc=4, out_nc=3, nc=nc, nb=nb, bias=False) \
        if "bias" in TorchUNetRes.__init__.__code__.co_varnames else \
        TorchUNetRes(in_nc=4, out_nc=3, nc=nc, nb=nb)
    tmodel.eval()

    params = torch_unetres_to_flax(tmodel.state_dict(), nb=nb)
    fmodel = UNetRes(out_nc=3, nc=tuple(nc), nb=nb)

    rng = np.random.RandomState(0)
    x = rng.rand(1, 32, 40, 4).astype(np.float32)
    with torch.no_grad():
        tout = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    tout = np.transpose(tout, (0, 2, 3, 1))

    fout = np.asarray(fmodel.apply(jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(x)))
    np.testing.assert_allclose(fout, tout, atol=1e-4)


def test_unet_conversion_forward_parity():
    """Plain UNet (network_unet.py:22-100) torch -> flax forward parity."""
    add_reference_to_path()
    stub_torchvision()
    import torch
    from lensless.recon.drunet.network_unet import UNet as TorchUNet
    from lenslesspicam_tpu.models.unet import UNet
    from lenslesspicam_tpu.zoo.convert import torch_unet_to_flax

    nc = [8, 16, 32, 64]
    nb = 2
    tmodel = TorchUNet(in_nc=3, out_nc=3, nc=nc, nb=nb)
    tmodel.eval()

    params = torch_unet_to_flax(tmodel.state_dict(), nb=nb)
    fmodel = UNet(out_nc=3, nc=tuple(nc), nb=nb)

    rng = np.random.RandomState(3)
    x = rng.rand(1, 32, 40, 3).astype(np.float32)
    with torch.no_grad():
        tout = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    tout = np.transpose(tout, (0, 2, 3, 1))

    fout = np.asarray(fmodel.apply(jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(x)))
    np.testing.assert_allclose(fout, tout, atol=1e-4)


def test_unrolled_admm_param_conversion():
    add_reference_to_path()
    stub_torchvision()
    import torch
    from lensless.recon.unrolled_admm import UnrolledADMM as RefUnrolledADMM
    from lenslesspicam_tpu.zoo.convert import torch_unrolled_admm_params
    from lenslesspicam_tpu.models.unrolled import UnrolledADMM

    rng = np.random.RandomState(1)
    psf = rng.rand(1, 24, 32, 3).astype(np.float32)
    psf /= np.linalg.norm(psf)
    ref = RefUnrolledADMM(torch.from_numpy(psf), n_iter=5)
    # perturb params so the test is non-trivial
    with torch.no_grad():
        ref._mu1_p.mul_(1.7)
        ref._tau_p.mul_(0.3)
    ref.reset()
    data = rng.rand(2, 1, 24, 32, 3).astype(np.float32)
    with torch.no_grad():
        tout = ref.forward(torch.from_numpy(data)).numpy()

    params = torch_unrolled_admm_params(ref.state_dict())
    model = UnrolledADMM(n_iter=5)
    conv = UnrolledADMM.make_convolver(psf)
    fout = np.asarray(model.apply(
        jax.tree_util.tree_map(jnp.asarray, params), conv, jnp.asarray(data)))
    np.testing.assert_allclose(fout, tout, atol=1e-4)


def test_restormer_conversion_forward_parity():
    """Reference Restormer (restormer.py:246-431) torch -> flax forward
    parity at a small config (BiasFree layernorm, the processor default
    in recon/utils.py:486-495)."""
    add_reference_to_path()
    stub_torchvision()
    import torch
    from lensless.recon.restormer import Restormer as TorchRestormer
    from lenslesspicam_tpu.models.restormer import Restormer
    from lenslesspicam_tpu.zoo.convert import torch_restormer_to_flax

    kw = dict(dim=8, num_blocks=[1, 1, 1, 1], num_refinement_blocks=1,
              heads=[1, 2, 2, 4], ffn_expansion_factor=2.66)
    tmodel = TorchRestormer(inp_channels=3, out_channels=3, bias=False,
                            LayerNorm_type="BiasFree", **kw)
    tmodel.eval()

    variables = torch_restormer_to_flax(tmodel.state_dict())
    fmodel = Restormer(out_channels=3, dim=8, num_blocks=(1, 1, 1, 1),
                       num_refinement_blocks=1, heads=(1, 2, 2, 4),
                       expansion=2.66, ln_bias=False)

    rng = np.random.RandomState(5)
    x = rng.rand(1, 32, 40, 3).astype(np.float32)
    with torch.no_grad():
        tout = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    tout = np.transpose(tout, (0, 2, 3, 1))

    fout = np.asarray(fmodel.apply(
        jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x)))
    np.testing.assert_allclose(fout, tout, atol=1e-4)
