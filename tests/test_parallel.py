"""Batching/sharding invariants (SURVEY §4: vmap-consistency + CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_sim_tpu import engine
from mujoco_sim_tpu.models.compile import load_model
from mujoco_sim_tpu.parallel import mesh as pmesh


def test_vmap_env0_equals_single():
    """Env 0 of a batch must track a single-env rollout bit-for-bit."""
    m = load_model("tests/fixtures/floor_box.xml")
    d = engine.make_data(m)
    B = 4
    dB = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), d)
    # perturb only envs 1..3
    dB = dB.replace(qpos=dB.qpos.at[1:, 2].add(
        0.1 * jnp.arange(1, B)))
    step1 = jax.jit(engine.step)
    stepB = jax.jit(jax.vmap(engine.step, in_axes=(None, 0)))
    for _ in range(20):
        d = step1(m, d)
        dB = stepB(m, dB)
    np.testing.assert_array_equal(np.asarray(d.qpos),
                                  np.asarray(dB.qpos[0]))
    # and the perturbed envs genuinely diverged
    assert not np.allclose(np.asarray(dB.qpos[1]), np.asarray(d.qpos))


def test_sharded_rollout_matches_unsharded():
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = pmesh.make_env_mesh(devices[:8])
    m = load_model("tests/fixtures/floor_ball.xml")
    nenv = 16
    dB = pmesh.make_batch(m, nenv)
    key = jax.random.PRNGKey(1)
    dz = jax.random.uniform(key, (nenv,), dtype=dB.qpos.dtype)
    dB = dB.replace(qpos=dB.qpos.at[:, 2].add(dz))

    ro_plain = jax.jit(lambda mm, dd: pmesh.rollout(mm, dd, 10))
    out_plain = ro_plain(m, dB)

    mS = pmesh.replicate_model(m, mesh)
    dS = jax.device_put(
        dB, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("env")))
    ro_sharded = pmesh.make_sharded_rollout(mS, mesh, 10)
    out_sharded = ro_sharded(mS, dS)
    np.testing.assert_allclose(np.asarray(out_plain.qpos),
                               np.asarray(out_sharded.qpos), atol=1e-12)


def test_ring_exchange():
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = pmesh.make_env_mesh(devices[:8])
    m = load_model("tests/fixtures/floor_ball.xml")
    dB = pmesh.make_batch(m, 8, mesh)
    # distinct x positions per env
    dB = dB.replace(qpos=dB.qpos.at[:, 0].set(jnp.arange(8.0, dtype=dB.qpos.dtype)))
    step = pmesh.make_sharded_step(m, mesh)
    dB = step(m, dB)
    pos, quat = pmesh.exchange_body_state(dB, mesh, body_id=1)
    pos = np.asarray(pos)
    # ring shift by one: env i receives env (i-1)'s x
    expect = np.roll(np.arange(8.0), 1)
    np.testing.assert_allclose(pos[:, 0], expect, atol=1e-5)


def test_egress_overlap_matches_oneshot():
    """rollout_collect (chunked, overlapped device->host egress) returns the
    same trajectory and final state as a single on-device scan."""
    import numpy as np
    from mujoco_sim_tpu.parallel.egress import rollout_collect

    m = load_model("tests/fixtures/floor_box.xml")
    m32 = engine.put_model(m, jnp.float32)
    mesh = pmesh.make_env_mesh()
    mR = pmesh.replicate_model(m32, mesh)
    dB = pmesh.make_batch(mR, 16, mesh)
    ref_final, ref_traj = jax.jit(
        lambda mm, dd: pmesh.rollout_traj(mm, dd, 32))(mR, dB)
    got_final, got_traj = rollout_collect(mR, dB, 32, chunk=8)
    np.testing.assert_array_equal(np.asarray(ref_traj), got_traj)
    np.testing.assert_array_equal(np.asarray(ref_final.qpos),
                                  np.asarray(got_final.qpos))
