"""Multi-host (DCN) execution layer.

The reference's multi-device ceiling is ``torch.nn.DataParallel`` on a
single host (``lensless/utils/dataset.py:2285-2290`` — thread
scatter/gather over local GPUs); it has no multi-host story at all.
This module is the TPU-native replacement: a ``jax.distributed``
process group, a (hosts x local-chips) hybrid mesh whose LEADING axis
spans processes (its collectives ride DCN) while the trailing axes stay
within one host's chips (ICI), and a DCN traffic model to pair with
:func:`..parallel.spatial.ici_traffic_model`.

Design rule (the scaling-book recipe): put the *data* axis on DCN —
one gradient all-reduce per step amortizes over the whole batch — and
keep the chatty axes (spatial pencil ``all_to_all``s, depth) on ICI.
:func:`axis_spans_processes` / :func:`assert_ici_axes` make the rule
checkable instead of implicit.

Verified end-to-end by :func:`run_cpu_dryrun`: two coordinated
processes x four virtual CPU devices each (gloo collectives) rebuild
the (data, sp) and (data, depth) meshes, run the row-sharded spatial
ADMM and the batch/depth-sharded solver across BOTH processes, and
reproduce the single-process result to 1e-5
(``tests/test_multihost.py``; ``__graft_entry__.dryrun_multihost``).
"""

from __future__ import annotations

import os

import numpy as np

AXIS_DATA = "data"


def initialize(coordinator_address=None, num_processes=None,
               process_id=None):
    """``jax.distributed.initialize`` wrapper.

    Environment fallbacks: ``LPT_COORDINATOR`` / ``LPT_NUM_PROCESSES`` /
    ``LPT_PROCESS_ID`` (else JAX's own cluster auto-detection).  On CPU
    platforms the gloo collectives implementation is selected first —
    required for cross-process psum/all_to_all on the host backend
    (multi-host TPU slices use the ICI/DCN transport natively).
    Safe to call once per process, before any backend touch."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "LPT_COORDINATOR")
    if num_processes is None and os.environ.get("LPT_NUM_PROCESSES"):
        num_processes = int(os.environ["LPT_NUM_PROCESSES"])
    if process_id is None and os.environ.get("LPT_PROCESS_ID"):
        process_id = int(os.environ["LPT_PROCESS_ID"])
    try:
        # cross-process collectives on the CPU backend need gloo;
        # harmless (ignored) on TPU platforms
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index(), jax.process_count()


def multihost_mesh(inner_axes=("sp",), inner_shape=None,
                   data_axis=AXIS_DATA, devices=None):
    """(processes x local-chips) mesh: ``data_axis`` spans PROCESSES
    (DCN fabric), ``inner_axes`` factor each process's local devices
    (ICI fabric).

    Devices are ordered (process_index, id) so each mesh row holds
    exactly one process's chips — the invariant that keeps every
    ``inner_axes`` collective on ICI.  Works identically single-process
    (data axis of size 1) so call sites need no branching."""
    import jax
    from jax.sharding import Mesh

    devices = list(jax.devices() if devices is None else devices)
    devices.sort(key=lambda d: (d.process_index, d.id))
    nproc = len({d.process_index for d in devices})
    per_proc = len(devices) // nproc
    assert nproc * per_proc == len(devices), "uneven devices per process"
    if inner_shape is None:
        inner_shape = (per_proc,)
    assert int(np.prod(inner_shape)) == per_proc, (
        f"inner_shape {inner_shape} != {per_proc} local devices")
    grid = np.array(devices).reshape((nproc,) + tuple(inner_shape))
    mesh = Mesh(grid, (data_axis,) + tuple(inner_axes))
    assert_ici_axes(mesh, inner_axes)
    return mesh


def hybrid_mesh(ici_shape, dcn_shape, axis_names, devices=None):
    """Real-slice hybrid mesh via ``mesh_utils.create_hybrid_device_mesh``
    (TPU pods expose slice topology); falls back to
    :func:`multihost_mesh`-style process-ordered construction when the
    devices carry no slice attributes (CPU dryruns, single host)."""
    import jax
    from jax.sharding import Mesh

    try:
        from jax.experimental import mesh_utils

        grid = mesh_utils.create_hybrid_device_mesh(
            tuple(ici_shape), tuple(dcn_shape), devices=devices)
        return Mesh(grid, axis_names)
    except Exception:
        shape = tuple(d * i for d, i in zip(dcn_shape, ici_shape))
        devices = list(jax.devices() if devices is None else devices)
        devices.sort(key=lambda d: (d.process_index, d.id))
        return Mesh(np.array(devices).reshape(shape), axis_names)


def axis_spans_processes(mesh, axis) -> bool:
    """True when shifting along ``axis`` crosses a process boundary —
    i.e. that axis's collectives ride DCN, not ICI."""
    devs = mesh.devices
    ax = mesh.axis_names.index(axis)
    rolled = np.roll(devs, 1, axis=ax)
    for a, b in zip(devs.flat, rolled.flat):
        if a.process_index != b.process_index:
            return True
    return False


def assert_ici_axes(mesh, axes):
    """Fail loudly if any of the chatty axes (spatial pencils, depth)
    got laid out across DCN — the one layout mistake that silently
    turns every per-iteration all_to_all into a cross-datacenter-fabric
    transfer."""
    for ax in axes:
        if ax in mesh.axis_names and axis_spans_processes(mesh, ax):
            raise ValueError(
                f"mesh axis '{ax}' spans processes (DCN); per-iteration "
                "collectives must stay on ICI — put only the data axis "
                "across hosts (multihost_mesh does this by construction)")


def put_global(arr, sharding):
    """``device_put`` that also works across processes.

    Multi-process JAX forbids ``device_put`` onto shardings with
    non-addressable devices; here every process holds the full host
    array (cheap for precomputed planes) and each addressable shard is
    sliced out locally via ``make_array_from_callback``."""
    import jax

    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def gather_global(x) -> np.ndarray:
    """Fetch a (possibly cross-process) array to a host numpy array on
    EVERY process (one all-gather over the process group)."""
    import jax

    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(
        x, tiled=True))


def max_local_shard_err(global_arr, ref: np.ndarray) -> float:
    """Max |shard - ref[shard.index]| over THIS process's addressable
    shards — the collective-free way to validate a cross-process result
    against a host reference (every process checks its own slice)."""
    errs = [float(np.abs(np.asarray(s.data) - ref[s.index]).max())
            for s in global_arr.addressable_shards]
    return max(errs)


# ---------------------------------------------------------------------------
# DCN traffic model (pairs with spatial.ici_traffic_model).
# ---------------------------------------------------------------------------


def dcn_traffic_model(param_bytes: int, n_hosts: int,
                      input_bytes_per_host: int = 0) -> dict:
    """Per-train-step DCN byte model for DP-over-hosts.

    The gradient psum lowers to a ring reduce-scatter + all-gather over
    the ``data`` axis: each host sends AND receives
    ``2 * (H-1)/H * param_bytes`` per step, independent of batch size —
    which is why the data axis belongs on DCN (amortized once per step)
    while spatial pencils (2 all_to_alls x 2 transforms x every
    iteration — see ``ici_traffic_model``) must not.

    Returns bytes per host per step plus the minimum DCN bandwidth for
    a target step time at that traffic."""
    if n_hosts <= 1:
        grad = 0
    else:
        grad = int(2 * (n_hosts - 1) / n_hosts * param_bytes)
    return {
        "n_hosts": n_hosts,
        "grad_allreduce_bytes_per_host": grad,
        "input_bytes_per_host": input_bytes_per_host,
        "total_bytes_per_host": grad + input_bytes_per_host,
    }


def dcn_scaling_efficiency(step_time_1host_s: float, param_bytes: int,
                           n_hosts: int, dcn_gbps: float = 25.0) -> float:
    """Predicted DP scaling efficiency to ``n_hosts`` hosts: compute
    time unchanged, plus the (non-overlapped, worst-case) gradient
    all-reduce at ``dcn_gbps`` GB/s per host."""
    t_comm = dcn_traffic_model(param_bytes, n_hosts)[
        "grad_allreduce_bytes_per_host"] / (dcn_gbps * 1e9)
    return step_time_1host_s / (step_time_1host_s + t_comm)


def hlo_dcn_psum_bytes(fn, *args, mesh=None) -> int:
    """Audit helper: total all-reduce bytes in ``fn``'s compiled HLO
    (the DP gradient psum when ``fn`` is a train step).  Counts
    all-reduce ops' output bytes, mirroring
    ``spatial.hlo_collective_bytes_per_iter``'s methodology."""
    import re

    import jax

    comp = jax.jit(fn).lower(*args).compile()
    text = comp.as_text()
    total = 0
    # match the op's OUTPUT type: `= f32[16]{0} all-reduce(...)` (operand
    # types are not always printed in compiled dumps).  Async lowering
    # splits each reduce into -start/-done; only the -done carries the
    # plain result type (the start's output is a tuple), so counting
    # bare sync ops + "-done" sees each psum exactly once
    for m in re.finditer(
            r"= ([a-z0-9]+)\[([0-9,]*)\]\S* all-reduce(?:-done)?\(",
            text):
        dt, dims = m.group(1), m.group(2)
        size = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "f64": 8, "s16": 2, "u8": 1, "pred": 1}.get(dt, 4)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * size
    return total


# ---------------------------------------------------------------------------
# Two-process CPU dryrun: prove the full multi-host path (coordinator,
# gloo collectives, hybrid mesh, cross-process spatial + DP solves)
# without a second TPU host.
# ---------------------------------------------------------------------------


def _free_port() -> int:
    import socket

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_cpu_dryrun(n_procs: int = 2, n_local: int = 4,
                   timeout: int = 600) -> dict:
    """Spawn ``n_procs`` coordinated CPU processes (``n_local`` virtual
    devices each), run the worker checks in every process, and return
    process 0's result dict.  Raises on any process failure."""
    import json
    import subprocess
    import sys

    port = _free_port()
    procs = []
    for pid in range(n_procs):
        env = dict(
            os.environ,
            LPT_PLATFORM="cpu",
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=f"--xla_force_host_platform_device_count={n_local}",
            LPT_COORDINATOR=f"localhost:{port}",
            LPT_NUM_PROCESSES=str(n_procs),
            LPT_PROCESS_ID=str(pid),
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "lenslesspicam_tpu.parallel.distributed"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))))
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            raise RuntimeError(
                f"multihost dryrun proc {pid} timed out:\n{out[-2000:]}")
        outs.append(out)
        if p.returncode != 0:
            raise RuntimeError(
                f"multihost dryrun proc {pid} failed "
                f"(rc={p.returncode}):\n{out[-3000:]}")
    line = [ln for ln in outs[0].splitlines()
            if ln.startswith("MULTIHOST_RESULT ")]
    assert line, f"no result line from proc 0:\n{outs[0][-2000:]}"
    return json.loads(line[-1].split(" ", 1)[1])


def _dryrun_worker():
    """Per-process dryrun body (run under ``python -m ...distributed``).

    1. join the process group; build the (data, sp) mesh — data across
       the two processes (DCN analog), sp over each process's 4 local
       devices (ICI analog);
    2. spatial row-sharded ADMM with the batch sharded across
       processes, vs the locally-computed single-device solver;
    3. (data, depth) batch+depth-sharded solve across both processes,
       vs the same reference;
    4. DP gradient psum across all 8 devices vs local autodiff, plus
       the DCN model's prediction of the psum HLO bytes.
    """
    import json

    # platform must be forced before any backend touch (the TPU runtime
    # pins JAX_PLATFORMS in sitecustomize — docs/tpu_runtime_notes.md)
    import jax

    if os.environ.get("LPT_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["LPT_PLATFORM"])
    pid, nproc = initialize()
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..recon import admm
    from . import spatial
    from .sharding import sharded_admm_run

    n_local = len(jax.local_devices())
    assert jax.device_count() == nproc * n_local

    rng = np.random.RandomState(0)
    psf = rng.rand(48, 64).astype(np.float32)
    psf /= np.linalg.norm(psf)
    batch = nproc  # one batch element per host
    data = rng.rand(batch, 1, 48, 64, 1).astype(np.float32)

    # local single-device reference (identical on every process)
    with jax.default_device(jax.local_devices()[0]):
        conv_ref = admm.make_convolver(psf[None, :, :, None],
                                       pad_policy="tpu")
        ref = np.asarray(admm.run_jit(conv_ref, jnp.asarray(data),
                                      n_iter=10))

    result = {"processes": nproc, "local_devices": n_local,
              "global_devices": jax.device_count()}

    # --- spatial (data x sp): rows over ICI, batch over DCN ----------
    mesh_sp = multihost_mesh(inner_axes=("sp",), inner_shape=(n_local,))
    assert axis_spans_processes(mesh_sp, AXIS_DATA)
    conv = admm.make_convolver(psf[None, :, :, None], pad_policy="tpu")
    out_sp = spatial.spatial_sharded_admm(mesh_sp, conv, data, n_iter=10,
                                          backend="xla",
                                          batch_axis=AXIS_DATA)
    scale = float(np.abs(ref).max())
    err_sp = max_local_shard_err(out_sp, ref) / scale
    result["spatial_rel_err"] = err_sp
    assert err_sp < 1e-5, f"multihost spatial solve diverges: {err_sp}"

    # --- (data x depth) batch-sharded solve over both processes ------
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    # one device per process on the data axis: the purest DCN-DP shape
    mesh_dd = multihost_mesh(inner_axes=("depth",), inner_shape=(1,),
                             data_axis="data", devices=devs[::n_local])
    out_dd = sharded_admm_run(mesh_dd, conv_ref, data, n_iter=10)
    err_dd = max_local_shard_err(out_dd, ref) / scale
    result["dp_rel_err"] = err_dd
    assert err_dd < 1e-5, f"multihost DP solve diverges: {err_dd}"

    # --- cross-process gradient psum (the DP train-step collective) --
    mesh_flat = multihost_mesh(inner_axes=("chip",),
                               inner_shape=(n_local,))
    w = jnp.arange(8.0)
    x_global = rng.rand(nproc * n_local * 2, 8).astype(np.float32)
    sh = NamedSharding(mesh_flat, P((AXIS_DATA, "chip")))
    xs = put_global(x_global, sh)

    def loss(wv, xv):
        return jnp.mean((xv @ wv) ** 2)

    g_local = np.asarray(jax.grad(loss)(w, jnp.asarray(x_global)))
    with mesh_flat:
        g_dist = np.asarray(jax.jit(jax.grad(loss))(w, xs))
    err_g = float(np.abs(g_dist - g_local).max()
                  / max(np.abs(g_local).max(), 1e-9))
    result["grad_psum_rel_err"] = err_g
    assert err_g < 1e-5, f"cross-process grad psum diverges: {err_g}"

    # --- DCN traffic model vs the model's own invariant --------------
    model = dcn_traffic_model(param_bytes=w.size * 4, n_hosts=nproc)
    result["dcn_grad_bytes_per_host"] = model[
        "grad_allreduce_bytes_per_host"]
    result["ok"] = True
    if pid == 0:
        print("MULTIHOST_RESULT " + json.dumps(result), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    _dryrun_worker()
