"""Multi-host runtime: 2-process CPU jax.distributed integration.

The reference has no distributed runtime (SURVEY.md §2.2); ours must actually
work. This spawns two real processes that initialize the JAX distributed
runtime over a localhost coordinator, build the global 1-D mesh across both
processes' CPU devices, and run a cross-process psum — executing every
function in ``dexnerf_tpu.parallel.multihost``.
"""

import os
import socket
import subprocess
import sys

import pytest

from dexnerf_tpu.parallel import multihost

_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")

from dexnerf_tpu.parallel import multihost
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

addr, pid = sys.argv[1], int(sys.argv[2])
started = multihost.initialize(
    coordinator_address=addr, num_processes=2, process_id=pid
)
assert started, "initialize() returned False with explicit args"
assert multihost.process_count() == 2
assert multihost.is_primary() == (pid == 0)
nloc = multihost.local_device_count()
mesh = multihost.global_mesh()
assert mesh.devices.size == 2 * nloc, (mesh.devices.size, nloc)

# cross-process collective: psum of per-device values over the global mesh
def local_sum(x):
    return jax.lax.psum(x, "rays")

vals = jnp.arange(mesh.devices.size, dtype=jnp.float32)
out = jax.jit(
    jax.shard_map(local_sum, mesh=mesh, in_specs=P("rays"), out_specs=P("rays"))
)(vals)
# a globally-sharded array: only this process's shards are addressable
got = np.unique(
    np.concatenate([np.asarray(s.data) for s in out.addressable_shards])
)
want = float(vals.sum())
assert got.tolist() == [want], (got, want)
multihost.shutdown()
print("WORKER-OK", pid)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(300)
def test_two_process_distributed_psum(tmp_path):
    addr = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, addr, str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd="/root/repo",
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER-OK {pid}" in out


def test_initialize_noop_outside_cluster(monkeypatch):
    """No args + no cluster env -> graceful single-process no-op."""
    for v in multihost._CLUSTER_ENV_VARS:
        monkeypatch.delenv(v, raising=False)
    assert multihost.initialize() is False
    assert multihost.initialize(num_processes=1) is False


def test_single_process_helpers():
    assert multihost.is_primary()
    assert multihost.process_count() == 1
    assert multihost.local_device_count() >= 1
    assert multihost.global_mesh().devices.size >= 1
