"""Multi-process SPMD coverage (VERDICT r2 weak #7): a REAL 2-process
``jax.distributed`` run on the CPU backend exercising
``maybe_distributed_init`` and the ``process_count() > 1`` branch of
``shard_batch`` (``_local_rows`` slicing +
``make_array_from_process_local_data``).

Each subprocess owns 2 virtual CPU devices of a 4-device dp mesh,
contributes its process-local batch rows, and computes a global psum —
results must agree across processes and equal the single-process value.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
import numpy as np

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
    ).strip()

import jax
jax.config.update("jax_platforms", "cpu")

from fgs_nerf_tpu.parallel.mesh import (
    build_mesh, maybe_distributed_init, shard_batch,
)

maybe_distributed_init()
assert jax.process_count() == 2, jax.process_count()

import jax.numpy as jnp

mesh = build_mesh("dp=4")
n = 16
# every process computes the same deterministic global batch
batch = np.arange(n * 3, dtype=np.float32).reshape(n, 3) * 0.5
(sharded,) = shard_batch(mesh, batch)
assert sharded.shape == (n, 3)

out = jax.jit(lambda x: jnp.sum(x * 2.0))(sharded)
val = float(out)
print(f"RESULT {jax.process_index()} {val:.6f}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_shard_batch(tmp_path):
    port = _free_port()
    worker_path = tmp_path / "worker.py"
    worker_path.write_text(WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.update(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            PYTHONPATH=repo + os.pathsep + env.get("PYTHONPATH", ""),
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(worker_path)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=repo,
        ))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    vals = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, val = line.split()
                vals[int(pid)] = float(val)
    assert set(vals) == {0, 1}, f"missing results: {outs}"
    batch = np.arange(16 * 3, dtype=np.float32).reshape(16, 3) * 0.5
    expect = float(np.sum(batch * 2.0))
    np.testing.assert_allclose(vals[0], expect, rtol=1e-6)
    np.testing.assert_allclose(vals[1], expect, rtol=1e-6)


SHARDED_CKPT_WORKER = r"""
import os, sys
import numpy as np

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
    ).strip()

import jax
jax.config.update("jax_platforms", "cpu")

from fgs_nerf_tpu.parallel.mesh import build_mesh, maybe_distributed_init
from fgs_nerf_tpu.parallel.spatial_train import place_spatial
from fgs_nerf_tpu.optim.masked_adam import init_state
from fgs_nerf_tpu.train.checkpoint import load_checkpoint, save_checkpoint

maybe_distributed_init()
assert jax.process_count() == 2, jax.process_count()

import jax.numpy as jnp

mesh = build_mesh("dp=2,sp=2")
rng = np.random.default_rng(7)
params_np = {
    "sdf": rng.normal(size=(8, 4, 4, 1)).astype(np.float32),
    "k0": rng.normal(size=(8, 4, 4, 2)).astype(np.float32),
    "refnet": {"w0": rng.normal(size=(5, 3)).astype(np.float32)},
}
params = jax.tree.map(jnp.asarray, params_np)
params, opt_state = place_spatial(mesh, params, init_state(params))
# sp-sharded grid leaves on a 2-process mesh are NOT fully addressable:
# this save crashes without the allgather path (VERDICT r3 weak #5a)
assert not params["sdf"].is_fully_addressable
sdf_mask = jnp.where(params["sdf"] < 0.0, 1e-3, 0.0)

path = os.environ["CKPT_PATH"]
save_checkpoint(
    path, global_step=3, params=params, opt_state=opt_state,
    sdf_mask=sdf_mask, xyz_min=[-1, -1, -1], xyz_max=[1, 1, 1],
)
ck = load_checkpoint(path)
for name in ("sdf", "k0"):
    np.testing.assert_array_equal(ck.params[name], params_np[name])
np.testing.assert_array_equal(ck.params["refnet"]["w0"],
                              params_np["refnet"]["w0"])
np.testing.assert_array_equal(
    ck.artifacts["sdf_mask"],
    np.where(params_np["sdf"] < 0.0, 1e-3, 0.0).astype(np.float32),
)
assert ck.global_step == 3
# restore roundtrip: re-place the loaded grids with the same shardings
re_params, _ = place_spatial(
    mesh, jax.tree.map(jnp.asarray, ck.params), init_state(params)
)
s = float(jax.jit(lambda p: jnp.sum(p["sdf"]) + jnp.sum(p["k0"]))(re_params))
print(f"RESULT {jax.process_index()} {s:.6f}", flush=True)
"""


def test_two_process_sharded_checkpoint_roundtrip(tmp_path):
    """sp-sharded grids survive a save/restore across 2 real processes
    (VERDICT r3 weak #5a: device_get on non-addressable arrays)."""
    port = _free_port()
    worker_path = tmp_path / "worker_ckpt.py"
    worker_path.write_text(SHARDED_CKPT_WORKER)
    ckpt_path = str(tmp_path / "shard_ckpt.npz")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.update(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            CKPT_PATH=ckpt_path,
            PYTHONPATH=repo + os.pathsep + env.get("PYTHONPATH", ""),
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(worker_path)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=repo,
        ))
    vals = {}
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("sharded-ckpt worker timed out")
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, val = line.split()
                vals[int(pid)] = float(val)
    assert set(vals) == {0, 1}, f"missing results: {vals}"
    # both processes computed the same restored-grid reduction
    np.testing.assert_allclose(vals[0], vals[1], rtol=1e-6)
