"""Multi-host smoke test: 2 processes, one logical mesh (SURVEY §4: a
single-machine fake of a cluster, which the reference never had)."""

import os
import subprocess
import sys

import pytest

_WORKER = r'''
import os, sys
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); nproc = int(sys.argv[2])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
jax.distributed.initialize(coordinator_address="127.0.0.1:%(port)d",
                           num_processes=nproc, process_id=pid)
import jax.numpy as jnp, numpy as np
from mujoco_sim_tpu import engine
from mujoco_sim_tpu.models.compile import load_model
from mujoco_sim_tpu.parallel import distributed as D, mesh as pmesh
mesh = D.global_env_mesh()
assert mesh.devices.size == 2 * nproc
m = load_model(%(repo)r + "/tests/fixtures/floor_ball.xml")
m = engine.put_model(m, jnp.float32)
m = pmesh.replicate_model(m, mesh)
d0 = engine.make_data(m, jnp.float32)
def mk(i):
    return jax.tree.map(lambda x: np.asarray(x),
                        d0.replace(qpos=d0.qpos.at[2].add(0.05 * i)))
dB = D.host_local_batch(mk, 8, mesh)
ro = pmesh.make_sharded_rollout(m, mesh, 5)
dB = ro(m, dB)
local = jax.tree.map(lambda x: x.addressable_data(0), dB.qpos)
print(f"DIST_OK {pid} {float(np.asarray(local)[0, 2]):.6f}", flush=True)
'''


def test_two_process_mesh(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER % {"repo": repo, "port": 9917})
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), "2"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    marks = [l for o in outs for l in o.splitlines()
             if l.startswith("DIST_OK")]
    assert len(marks) == 2, outs
    # each process sees its own shard: env0 of proc0 vs env4 of proc1
    z0 = float(marks[0].split()[2]) if marks[0].split()[1] == "0" else \
        float(marks[1].split()[2])
    z1 = float(marks[1].split()[2]) if marks[1].split()[1] == "1" else \
        float(marks[0].split()[2])
    assert abs((z1 - z0) - 0.2) < 1e-3  # 4 envs * 0.05 offset
