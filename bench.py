"""Benchmark: batched env stepping throughput on the attached TPU chip.

Prints ONE JSON line:
  {"metric": "env_steps_per_sec_per_chip", "value": N, "unit": "env-steps/s",
   "vs_baseline": N/1e6}

vs_baseline is the fraction of the BASELINE.md aggregate target
(>= 1M env-steps/s on a multi-host slice) achieved on this single chip at
4096 envs (BASELINE.json primary metric: env-steps/s/chip at 4096 envs).

Scenario: contact-rich free box on the floor plane (plane-box manifold +
friction solver active every step), 4096 envs, on-device scan rollout.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

NENV = int(os.environ.get("BENCH_NENV", 4096))
NSTEPS = int(os.environ.get("BENCH_NSTEPS", 200))


def main():
    from mujoco_sim_tpu import engine
    from mujoco_sim_tpu.models.compile import load_model
    from mujoco_sim_tpu.parallel import mesh as pmesh

    m = load_model(os.path.join(_REPO, "tests/fixtures/floor_box.xml"))
    m = engine.put_model(m, jnp.float32)

    d = engine.make_data(m, jnp.float32)
    dB = jax.tree.map(lambda x: jnp.broadcast_to(x, (NENV,) + x.shape), d)
    # de-correlate envs: vary initial height and spin
    key = jax.random.PRNGKey(0)
    dz = jax.random.uniform(key, (NENV,), minval=0.0, maxval=0.3)
    w = jax.random.uniform(key, (NENV, 3), minval=-0.5, maxval=0.5)
    dB = dB.replace(
        qpos=dB.qpos.at[:, 2].add(dz),
        qvel=dB.qvel.at[:, 3:6].set(w),
    )

    nsteps = NSTEPS

    @jax.jit
    def run(model, data):
        return pmesh.rollout(model, data, nsteps)

    # compile
    t0 = time.time()
    out = run(m, dB)
    jax.block_until_ready(out.qpos)
    compile_time = time.time() - t0

    # timed
    t0 = time.time()
    out = run(m, out)
    jax.block_until_ready(out.qpos)
    dt = time.time() - t0

    env_steps_per_sec = NENV * nsteps / dt
    result = {
        "metric": "env_steps_per_sec_per_chip",
        "value": round(env_steps_per_sec, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(env_steps_per_sec / 1_000_000.0, 4),
    }
    print(json.dumps(result))
    print(f"# nenv={NENV} nsteps={nsteps} wall={dt:.3f}s "
          f"compile={compile_time:.1f}s device={jax.devices()[0]}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
