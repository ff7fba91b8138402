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


_SUBPROC_2P = """
import numpy as np
import jax
from stark_symphony_tpu.utils import distributed as D

assert D.initialize_from_env() is True
assert D.process_count() == 2
assert jax.local_device_count() == 4 and jax.device_count() == 8

from stark_symphony_tpu.models.stwo import proof as P
from stark_symphony_tpu.models.stwo.config import TESTING
from stark_symphony_tpu.parallel.batch import verify_batch_dp
from stark_symphony_tpu.utils.proofcache import cached_stwo_proof

proof = cached_stwo_proof(TESTING)
batch = P.replicate(proof, 16)
te = np.array(batch.trace_evals)
te[3] += 1  # tamper lane 3: its rejection must survive the global psum
batch = batch._replace(trace_evals=te)

mesh = D.global_mesh()   # (dp=8, tp=1) spanning BOTH processes
assert mesh.devices.size == 8
_, n_ok = verify_batch_dp(batch, TESTING, mesh)
# the accept-count psum crossed the process boundary: each process holds
# 4 of the 8 dp shards (2 proofs each), so no single process saw all 15
n_ok = int(np.asarray(n_ok))
assert n_ok == 15, n_ok
print("DISTRIBUTED_2P_OK", n_ok)
"""


def test_two_process_distributed_dp():
    """A REAL >= 2-process multi-controller run on localhost (VERDICT r04
    missing #2): two subprocesses, 4 virtual CPU devices each, one global
    (dp=8) mesh, verify_batch_dp with the accept-count psum crossing the
    process boundary."""
    import pathlib
    import socket
    import subprocess
    import sys

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()

    repo = str(pathlib.Path(__file__).parent.parent)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "PYTHONPATH": repo,  # drop the axon sitecustomize (see above)
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "STPU_COORDINATOR": f"localhost:{port}",
            "STPU_NUM_PROCESSES": "2",
            "STPU_PROCESS_ID": str(pid),
            "JAX_COMPILATION_CACHE_DIR": os.path.join(repo, ".jax_cache"),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _SUBPROC_2P], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, (out[-1000:], err[-3000:])
        assert "DISTRIBUTED_2P_OK 15" in out


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
