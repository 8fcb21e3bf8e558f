"""Multi-host bring-up exercised for real: two OS processes joined through
jax.distributed over the CPU backend (the standard way to test pod code
without a pod). Validates mesh.distributed_init, a cross-process collective,
and the host-sharded SVD stripe/allgather (ops.svd.host_svd_sharded).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from grasp_tpu.parallel.mesh import distributed_init

coord, pid = sys.argv[1], int(sys.argv[2])
distributed_init(coordinator_address=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# --- cross-process collective over a global ("data",) mesh ---------------
devices = jax.devices()  # both processes' devices, globally visible
mesh = Mesh(np.array(devices), ("data",))

def s(x):
    return jax.lax.psum(x, "data")

summed = jax.jit(
    jax.shard_map(s, mesh=mesh, in_specs=P("data"), out_specs=P())
)(
    jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")),
        np.full((len(jax.local_devices()),), float(pid + 1), np.float32),
    )
)
psum_val = float(np.asarray(jax.device_get(summed))[0] if np.ndim(summed) else summed)

# --- host-sharded SVD: stripes across the two processes ------------------
from grasp_tpu.ops.svd import _host_svd, host_svd_sharded

rng = np.random.default_rng(0)
stack = rng.normal(size=(5, 12, 8)).astype(np.float32)
u, sv, vh = host_svd_sharded(jnp.asarray(stack))
u1, sv1, vh1 = _host_svd(stack)  # single-process truth
ok = (
    np.allclose(np.asarray(sv), sv1, atol=1e-5)
    and all(
        np.allclose(
            np.abs(np.asarray(u)[i].T @ u1[i]).diagonal(), 1.0, atol=1e-4
        )
        for i in range(5)
    )
)

if pid == 0:
    print(json.dumps({
        "process_count": jax.process_count(),
        "n_global_devices": len(devices),
        "psum": psum_val,
        "svd_ok": bool(ok),
    }))
"""


def test_two_process_distributed_cpu(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        # each process contributes its own CPU device(s); drop the 8-device
        # virtualization so the global mesh is a clean 2 x 1-device layout
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(i)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=280) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-3000:]}"

    line = [ln for ln in outs[0][0].splitlines() if ln.startswith("{")][-1]
    report = json.loads(line)
    assert report["process_count"] == 2
    assert report["n_global_devices"] == 2
    assert report["psum"] == 3.0  # 1.0 (pid 0) + 2.0 (pid 1)
    assert report["svd_ok"] is True
