"""Multi-process DCN initialization: the distribute-cache.c replacement.

Spawns TWO separate python processes that rendezvous through
parallel.mesh.init_distributed (jax.distributed coordinator), build one
global mesh spanning both processes' CPU devices, and jointly reduce a
globally-sharded array.  This is the multi-host story SURVEY §2.5 assigns
to jax.distributed (vs the reference's TCP pixel server,
MagickCore/distribute-cache.c:939) actually executing — every process
must see all 4 global devices and agree on the psum result.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")

coord, pid = sys.argv[1], int(sys.argv[2])
from imagemagick_tpu.parallel import mesh as pm

n = pm.init_distributed(coord, num_processes=2, process_id=pid)
assert n == 4, f"expected 4 global devices, saw {n}"
assert jax.process_count() == 2

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devs = np.array(jax.devices()).reshape(2, 2)
mesh = Mesh(devs, ("dp", "sx"))
sharding = NamedSharding(mesh, P("dp", None))
data = np.arange(32, dtype=np.float32).reshape(4, 8)

def cb(index):
    return data[index]

arr = jax.make_array_from_callback((4, 8), sharding, cb)
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
print(f"TOTAL {float(total):.1f}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen([sys.executable, str(worker), coord, str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True, env=env)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)
    # both processes computed the same global reduction: sum(0..31) = 496
    for out in outs:
        assert "TOTAL 496.0" in out
