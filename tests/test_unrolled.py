"""Unrolled ADMM/FISTA: golden parity vs reference torch at init params,
gradient flow, and batch consistency."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import reference_available, add_reference_to_path
from lenslesspicam_tpu.models.unrolled import UnrolledADMM, UnrolledFISTA


def _problem(shape=(1, 32, 40, 3), seed=0, batch=2):
    rng = np.random.RandomState(seed)
    psf = rng.rand(*shape).astype(np.float32)
    psf /= np.linalg.norm(psf)
    data = rng.rand(batch, *shape).astype(np.float32)
    return psf, data


def test_unrolled_admm_matches_classical_at_init():
    """With constant schedules at the classical defaults, the unrolled
    forward equals n_iter of classical ADMM."""
    from lenslesspicam_tpu.recon import admm as jadmm

    psf, data = _problem(batch=1)
    model = UnrolledADMM(n_iter=5)
    conv = UnrolledADMM.make_convolver(psf)
    params = model.init(jax.random.PRNGKey(0), conv, jnp.asarray(data))
    out = model.apply(params, conv, jnp.asarray(data))

    classical = jadmm.run_jit(jadmm.make_convolver(psf), data, n_iter=5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(classical), atol=1e-5)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_unrolled_admm_golden_torch():
    add_reference_to_path()
    import torch
    from lensless.recon.unrolled_admm import UnrolledADMM as RefUnrolledADMM

    psf, data = _problem(batch=2)
    ref = RefUnrolledADMM(torch.from_numpy(psf), n_iter=5)
    with torch.no_grad():
        ref_out = ref.forward(torch.from_numpy(data)).numpy()

    model = UnrolledADMM(n_iter=5)
    conv = UnrolledADMM.make_convolver(psf)
    params = model.init(jax.random.PRNGKey(0), conv, jnp.asarray(data))
    out = np.asarray(model.apply(params, conv, jnp.asarray(data)))
    np.testing.assert_allclose(out, ref_out, atol=1e-4)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_unrolled_fista_golden_torch():
    add_reference_to_path()
    import torch
    from lensless.recon.unrolled_fista import UnrolledFISTA as RefUnrolledFISTA

    psf, data = _problem(batch=2, seed=1)
    ref = RefUnrolledFISTA(torch.from_numpy(psf), n_iter=5)
    with torch.no_grad():
        ref_out = ref.forward(torch.from_numpy(data)).numpy()

    model = UnrolledFISTA(n_iter=5)
    conv = UnrolledFISTA.make_convolver(psf)
    jpsf = jnp.asarray(psf)
    params = model.init(jax.random.PRNGKey(0), conv, jnp.asarray(data), jpsf)
    out = np.asarray(model.apply(params, conv, jnp.asarray(data), jpsf))
    np.testing.assert_allclose(out, ref_out, atol=1e-4)


@pytest.mark.parametrize("remat", [False, True])
def test_gradients_flow(remat):
    psf, data = _problem(batch=2)
    target = jnp.asarray(np.random.RandomState(9).rand(*data.shape).astype(np.float32))
    model = UnrolledADMM(n_iter=3, remat=remat)
    conv = UnrolledADMM.make_convolver(psf)
    params = model.init(jax.random.PRNGKey(0), conv, jnp.asarray(data))

    def loss_fn(p):
        out = model.apply(p, conv, jnp.asarray(data))
        return jnp.mean((out - target) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert len(leaves) == 4  # mu1, mu2, mu3, tau schedules
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in leaves)


def test_batch_consistency():
    psf, data = _problem(batch=3)
    model = UnrolledADMM(n_iter=3)
    conv = UnrolledADMM.make_convolver(psf)
    params = model.init(jax.random.PRNGKey(0), conv, jnp.asarray(data))
    full = np.asarray(model.apply(params, conv, jnp.asarray(data)))
    one = np.asarray(model.apply(params, conv, jnp.asarray(data[1:2])))
    np.testing.assert_allclose(full[1:2], one, atol=1e-5)
