"""Multi-process entry point (SURVEY §5.8 / VERDICT r4 item 6).

Spawns TWO real CPU processes that rendezvous through
`tpuflow.parallel.distributed.initialize` (localhost coordinator, the
standard `jax.distributed` recipe) and run a small data-parallel TV-L1
solve over the 2-process global mesh — exercising the real
`jax.distributed.initialize` branch that single-process tests and the
virtual 8-device mesh cannot reach.

Each process holds one sample of a global B=2 batch; the jitted solve
runs on the global mesh (GSPMD inserts any needed collectives; for DP
there are none on the hot path), and each process checks its local
shard against a single-process solve of the same sample.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import sys
sys.path.insert(0, {root!r})
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from tpuflow.parallel.distributed import initialize

pid = int(sys.argv[1])
used = initialize(coordinator_address={coord!r}, num_processes=2,
                  process_id=pid)
assert used, "initialize() must take the multi-process branch"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2 * jax.local_device_count()

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tpuflow.models.tvl1 import tvl1_scale

ny, nx = 32, 48
rng = np.random.default_rng(7)
batch = rng.standard_normal((2, ny, nx)).astype(np.float32) * 50 + 128
shifted = np.roll(batch, 1, axis=2)

from jax.sharding import Mesh
mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("batch",))
spec = P("batch")
sharding = NamedSharding(mesh, spec)

def put(host):
    # each process contributes its own local shard of the global batch
    return jax.make_array_from_process_local_data(sharding, host[
        pid * (2 // jax.process_count()):
        (pid + 1) * (2 // jax.process_count())], host.shape)

I0 = put(batch)
I1 = put(shifted)
z = jnp.zeros((2, ny, nx), jnp.float32)
zs = put(np.zeros((2, ny, nx), np.float32))

@jax.jit
def solve(a, b, u, v):
    return jax.vmap(lambda p, q, r, s: tvl1_scale(
        p, q, r, s, warps=1, max_iterations=10, stop="fixed"))(a, b, u, v)

u, v = solve(I0, I1, zs, zs)

# local shard must equal the single-process solve of the same sample
local = u.addressable_shards[0]
sample = local.index[0].start or 0
u_ref, v_ref = jax.jit(lambda p, q: tvl1_scale(
    p, q, jnp.zeros((ny, nx), jnp.float32), jnp.zeros((ny, nx), jnp.float32),
    warps=1, max_iterations=10, stop="fixed"))(
        jnp.asarray(batch[sample]), jnp.asarray(shifted[sample]))
np.testing.assert_allclose(np.asarray(local.data)[0], np.asarray(u_ref),
                           rtol=0, atol=1e-5)
print("DIST_OK", pid, flush=True)
"""


@pytest.mark.skipif(sys.platform != "linux", reason="linux-only rendezvous")
def test_two_process_distributed_dp(tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(root=root, coord=coord))
    env = dict(os.environ)
    # one CPU device per process: the 2-device global mesh comes from
    # the two processes, which is the point of the test
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"DIST_OK {i}" in out, out
