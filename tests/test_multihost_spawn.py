"""REAL multi-process validation of the multihost (DCN) helpers.

Spawns two jax processes coordinated over loopback
(``jax.distributed.initialize``), each owning 2 virtual CPU devices; every
process loads only its ``process_slice`` of the global batch and the helpers
assemble the globally-sharded array (SURVEY.md §5.8 — the reference has no
distributed support at all).
"""

import os
import socket
import subprocess
import sys

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2").strip()
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

coord, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()  # 2 local x 2 processes

from jax.sharding import Mesh
from attention_based_e2e_asr_dnn_tpu.parallel.multihost import (
    global_batch_from_local, process_slice)

mesh = Mesh(np.array(jax.devices()), ("data",))
GLOBAL = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
sl = process_slice(8)
assert (sl.start, sl.stop) == (pid * 4, pid * 4 + 4), sl
xg = global_batch_from_local(mesh, GLOBAL[sl])
assert xg.shape == (8, 3)

total = jax.jit(jnp.sum)(xg)
expected = float(GLOBAL.sum())
got = float(total)
assert abs(got - expected) < 1e-5, (got, expected)
print(f"proc {pid}: global sum ok ({got})")
"""


def test_two_process_global_batch_assembly(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coord, str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=150)[0].decode() for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert "global sum ok" in out
