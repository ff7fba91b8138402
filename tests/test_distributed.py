"""Multi-host runtime harness (SURVEY.md §2.4 collectives backend row).

Exercises the REAL multi-controller code path — jax.distributed.initialize
with a live coordination service — in its 1-process form, plus the global
mesh/batch-slice conventions used by the multi-host launch pattern.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from stark_symphony_tpu.utils import distributed as D


def test_initialize_from_env_noop_without_env(monkeypatch):
    monkeypatch.delenv("STPU_COORDINATOR", raising=False)
    assert D.initialize_from_env() is False


def test_global_mesh_and_batch_slice():
    mesh = D.global_mesh(tp=2)
    assert mesh.devices.size == jax.device_count()
    assert mesh.axis_names == ("dp", "tp")

    start, size = D.local_batch_slice(16)
    assert (start, size) == (0, 16)

    # a cross-device collective rides the global mesh
    def local(x):
        return jax.lax.psum(jnp.sum(x), "dp")

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=P("dp"), out_specs=P()
    ))
    out = fn(jnp.ones((mesh.devices.size * 2,), jnp.int32))
    assert int(np.asarray(out).reshape(-1)[0]) == mesh.devices.size * 2


_SUBPROC = """
import os
import jax
from stark_symphony_tpu.utils import distributed as D

D.initialize_single()          # live coordination service, 1 process
D.initialize_single()          # idempotent
assert D.initialize_from_env() is True
assert D.process_count() == 1 and jax.process_index() == 0
mesh = D.global_mesh()
assert mesh.devices.size == jax.device_count() >= 8
print("DISTRIBUTED_OK", mesh.devices.size)
"""


def test_single_process_coordination_service():
    """jax.distributed.initialize must precede backend init, so the live
    coordination-service path runs in a fresh interpreter (CPU, 8 virtual
    devices — the same environment every host of a real multi-host launch
    would see before its first collective)."""
    import pathlib
    import subprocess
    import sys

    repo = str(pathlib.Path(__file__).parent.parent)
    env = dict(os.environ)
    env.update({
        # drop the axon sitecustomize: its eager backend probe would
        # initialize XLA before jax.distributed.initialize
        "PYTHONPATH": repo,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
    })
    env.pop("STPU_COORDINATOR", None)
    out = subprocess.run(
        [sys.executable, "-c", _SUBPROC], env=env, cwd=repo,
        capture_output=True, text=True, timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "DISTRIBUTED_OK" in out.stdout
