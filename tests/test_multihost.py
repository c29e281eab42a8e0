"""Multi-host (DCN) layer: 2-process x 4-device CPU dryrun.

The reference's multi-device ceiling is single-host
``torch.nn.DataParallel`` (lensless/utils/dataset.py:2285-2290); the
multi-host layer (parallel/distributed.py) has no reference
counterpart — it is a blueprint capability (SURVEY §5.8, BASELINE
">=85% scaling to 2+ hosts").  This test launches TWO coordinated
``jax.distributed`` processes with four virtual CPU devices each (gloo
collectives) and asserts the cross-process spatial/DP solves reproduce
the single-process solver at 1e-5.
"""

import numpy as np
import pytest

from lenslesspicam_tpu.parallel import distributed as dist


def test_cpu_dryrun_two_processes():
    r = dist.run_cpu_dryrun(n_procs=2, n_local=4)
    assert r["ok"]
    assert r["processes"] == 2 and r["global_devices"] == 8
    assert r["spatial_rel_err"] < 1e-5
    assert r["dp_rel_err"] < 1e-5
    assert r["grad_psum_rel_err"] < 1e-5


def test_multihost_mesh_layout_single_process():
    """Mesh construction + DCN/ICI axis classification on the in-process
    8-device mesh (conftest virtual devices): single-process, so NO axis
    spans processes and assert_ici_axes accepts everything."""
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = dist.multihost_mesh(inner_axes=("sp",), inner_shape=(8,))
    assert mesh.shape["data"] == 1 and mesh.shape["sp"] == 8
    assert not dist.axis_spans_processes(mesh, "sp")
    dist.assert_ici_axes(mesh, ("sp",))
    # hybrid helper: mesh_shape/dcn_shape are per-axis factors (same
    # length as axis_names); CPU devices have no slice topology so this
    # exercises the process-ordered fallback
    m2 = dist.hybrid_mesh((1, 8), (1, 1), ("data", "sp"))
    assert m2.devices.shape == (1, 8)


def test_dcn_traffic_model():
    m = dist.dcn_traffic_model(param_bytes=100_000_000, n_hosts=4)
    # ring all-reduce: 2 * 3/4 * 100 MB per host
    assert m["grad_allreduce_bytes_per_host"] == 150_000_000
    assert dist.dcn_traffic_model(1000, 1)[
        "grad_allreduce_bytes_per_host"] == 0
    # scaling efficiency: monotone in hosts, 1.0 at a single host
    e1 = dist.dcn_scaling_efficiency(0.5, 4 * 8_000_000, 1)
    e2 = dist.dcn_scaling_efficiency(0.5, 4 * 8_000_000, 2)
    e8 = dist.dcn_scaling_efficiency(0.5, 4 * 8_000_000, 8)
    assert e1 == 1.0 and e1 >= e2 >= e8 > 0.9


def test_hlo_dcn_psum_bytes_counts_allreduce():
    """The HLO audit helper sees the gradient all-reduce of a sharded
    loss — methodology check on the in-process mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = dist.multihost_mesh(inner_axes=("chip",), inner_shape=(8,))
    w = jnp.zeros((16,), jnp.float32)
    x = jnp.zeros((8, 16), jnp.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P(("data", "chip"))))

    def loss_grad(wv, xv):
        return jax.grad(lambda w_: jnp.mean((xv @ w_) ** 2))(wv)

    with mesh:
        n = dist.hlo_dcn_psum_bytes(loss_grad, w, xs)
    assert n >= 16 * 4, f"expected a >=64-byte grad all-reduce, got {n}"


def test_put_global_single_process_matches_device_put():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = dist.multihost_mesh(inner_axes=("sp",), inner_shape=(8,))
    x = np.arange(64.0).reshape(8, 8).astype(np.float32)
    sh = NamedSharding(mesh, P(None, "sp"))
    a = dist.put_global(x, sh)
    assert np.allclose(np.asarray(a), x)
    assert dist.max_local_shard_err(a, x) == 0.0
    assert np.allclose(dist.gather_global(jnp.asarray(x)), x)
