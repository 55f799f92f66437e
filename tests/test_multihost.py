"""Two-process multi-host rehearsal (round-1 VERDICT missing #4 / next #8).

Spawns two REAL processes, each exposing 4 virtual CPU devices, wires them
with ``init_distributed`` (local TCP coordinator), builds one global
8-device ('data','spatial') mesh spanning both processes, and runs ONE
GSPMD-sharded train step on tiny shapes.  Each process feeds only its
addressable half of the global batch via
``jax.make_array_from_process_local_data`` — the multi-host data-loading
pattern — and both must report the identical global loss.

This is the CPU stand-in for a multi-host TPU pod: same code path
(``parallel.mesh.init_distributed`` → global mesh → sharded step), with
DCN-over-ICI routing left to XLA.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")

coordinator, pid = sys.argv[1], int(sys.argv[2])
from upflow_pytorch_tpu.parallel.mesh import init_distributed
init_distributed(coordinator_address=coordinator, num_processes=2,
                 process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from upflow_pytorch_tpu.config import TrainerConfig, UPFlowConfig
from upflow_pytorch_tpu.parallel.mesh import make_mesh, replicate
from upflow_pytorch_tpu.parallel.step import make_sharded_train_step
from upflow_pytorch_tpu.train.step import create_train_state

conf = UPFlowConfig().updated(dict(
    if_use_cor_pytorch=True, if_sgu_upsample=True,
    photo_loss_census_weight=1.0, if_use_boundary_warp=True))
mesh = make_mesh(data=8, spatial=1)
model, state, tx = create_train_state(conf, TrainerConfig())
state = replicate(mesh, state)
train_step = make_sharded_train_step(model, tx, mesh)

# global batch 8, each process holds its local half (4 items)
rng = np.random.RandomState(0)
h = w = 32; margin = 8; b_global = 8
raw = rng.rand(b_global, h + 2 * margin, w + 2 * margin, 3).astype(np.float32)
full = {
    "im1_raw": raw,
    "im2_raw": np.roll(raw, 1, axis=2),
    "im1": raw[:, margin:margin + h, margin:margin + w],
    "im2": np.roll(raw, 1, axis=2)[:, margin:margin + h, margin:margin + w],
    "start": np.full((b_global, 2), float(margin), np.float32),
}
sharding = NamedSharding(mesh, P("data"))
lo, hi = (0, 4) if pid == 0 else (4, 8)
batch = {
    k: jax.make_array_from_process_local_data(sharding, v[lo:hi], v.shape)
    for k, v in full.items()
}
state, metrics = train_step(state, batch)
loss = float(np.asarray(metrics["total_loss"].addressable_data(0)))
print("MULTIHOST_LOSS %.6f" % loss, flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train_step(tmp_path):
    coordinator = "127.0.0.1:%d" % _free_port()
    env = dict(os.environ)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=4"])
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(_WORKER)
    procs = [
        subprocess.Popen([sys.executable, str(worker_py), coordinator, str(i)],
                         env=env, cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))),
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, "worker %d failed:\n%s" % (i, out[-4000:])
    losses = [line.split()[1] for out in outs for line in out.splitlines()
              if line.startswith("MULTIHOST_LOSS")]
    assert len(losses) == 2, outs
    assert losses[0] == losses[1], losses
