"""Device-mesh sharding for reconstruction and training.

The reference's entire multi-device story is ``torch.nn.DataParallel``
(thread scatter/gather on one host — lensless/utils/dataset.py:2285-2290,
SURVEY §2.6).  Here parallelism is first-class SPMD over a
``jax.sharding.Mesh``:

* ``data`` axis  — batch of measurements (dataset-scale eval, DP training);
* ``depth`` axis — 3-D multi-depth PSF stacks (the reference cannot
  parallelize depth at all);

Shardings are attached with NamedSharding/``jax.device_put`` and
``jax.jit`` — XLA's SPMD partitioner inserts the collectives (gradient
psums over ICI for DP training; depth stays embarrassingly parallel).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .distributed import put_global


def make_mesh(n_data: int | None = None, n_depth: int = 1, devices=None) -> Mesh:
    """Build a ``(data, depth)`` mesh from available devices."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_depth
    assert n_data * n_depth <= len(devices), "not enough devices"
    grid = np.asarray(devices[: n_data * n_depth]).reshape(n_data, n_depth)
    return Mesh(grid, ("data", "depth"))


def batch_spec() -> P:
    """(batch, depth, H, W, C) — shard batch over 'data', depth over 'depth'."""
    return P("data", "depth")


def conv_spec() -> P:
    """FFTConvolver.H is (depth, Ph, Pw/2+1, C) — shard depth only."""
    return P("depth")


def shard_convolver(mesh: Mesh, conv):
    """Place the convolver's spectrum depth-sharded on the mesh."""
    import dataclasses

    H = put_global(conv.H, NamedSharding(mesh, conv_spec()))
    return dataclasses.replace(conv, H=H)


def shard_batch(mesh: Mesh, data):
    return put_global(data, NamedSharding(mesh, batch_spec()))


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: put_global(x, sharding), tree)


def sharded_admm_run(mesh: Mesh, conv, data, params=None, n_iter=100):
    """Batch+depth-sharded classical ADMM over the mesh.

    Depths and batch elements are independent, so this scales linearly
    with zero collective traffic — the measurement of record for the
    dataset-scale eval config (BASELINE config 4).
    """
    import jax.numpy as jnp

    from ..recon import admm

    if params is None:
        params = admm.ADMMParams()
    conv = shard_convolver(mesh, conv)
    data = shard_batch(mesh, jnp.asarray(data))
    out_sharding = NamedSharding(mesh, batch_spec())

    run = jax.jit(
        lambda c, d, p, n: admm.run(c, d, p, n),
        out_shardings=out_sharding,
    )
    return run(conv, data, params, jnp.asarray(n_iter))
