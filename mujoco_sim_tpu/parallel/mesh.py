"""Env-axis parallelism over a device mesh.

The reference's scaling story is 3 sim processes exchanging body state over
ROS topics (launch/multi_mujoco_sim.launch, SURVEY §2.5).  TPU-native
equivalent: thousands of env instances as a leading batch axis, sharded over
a ``Mesh`` with ``NamedSharding``/``shard_map``; cross-instance coupling
(the send:/receive: weld sync of src/config/sim_1.yaml) becomes in-mesh
collectives (ppermute) instead of sockets.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mujoco_sim_tpu import engine
from mujoco_sim_tpu.models.model import Model, Data


def make_env_mesh(devices=None, axis: str = "env") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def replicate_model(m: Model, mesh: Mesh) -> Model:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sharding), m)


def make_batch(m: Model, nenv: int, mesh: Mesh | None = None,
               dtype=jnp.float32) -> Data:
    """Batched Data with leading env axis, optionally sharded over mesh."""
    d = engine.make_data(m, dtype)
    dB = jax.tree.map(lambda x: jnp.broadcast_to(x, (nenv,) + x.shape), d)
    if mesh is not None:
        ax = mesh.axis_names[0]
        shard = NamedSharding(mesh, P(ax))
        dB = jax.tree.map(
            lambda x: jax.device_put(x, shard) if x.ndim >= 1 else x, dB)
    return dB


def batched_step(m: Model, dB: Data) -> Data:
    return jax.vmap(engine.step, in_axes=(None, 0))(m, dB)


def rollout(m: Model, dB: Data, nsteps: int) -> Data:
    """On-device rollout: scan over time, env axis stays sharded."""
    def body(d, _):
        return batched_step(m, d), ()

    dB, _ = jax.lax.scan(body, dB, None, length=nsteps)
    return dB


def rollout_traj(m: Model, dB: Data, nsteps: int, extract=None):
    """On-device rollout that also stacks per-step observations.

    extract(d) -> pytree of observables (default: qpos).  Returns
    (final Data, traj pytree with leading [nsteps] axis).  This is the
    trajectory-egress path (SURVEY §2.5): scan on device, ONE
    device-to-host transfer at the end instead of per-step reads.
    """
    extract = extract or (lambda d: d.qpos)

    def body(d, _):
        d = batched_step(m, d)
        return d, extract(d)

    dB, traj = jax.lax.scan(body, dB, None, length=nsteps)
    return dB, traj


def make_sharded_step(m: Model, mesh: Mesh):
    """jit-compiled batched step with env axis sharded over the mesh."""
    ax = mesh.axis_names[0]
    data_sharding = jax.tree.map(
        lambda _: NamedSharding(mesh, P(ax)), jax.tree.structure(None))
    step = jax.jit(
        batched_step,
        in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P(ax))),
        out_shardings=NamedSharding(mesh, P(ax)),
    )
    return step


def make_sharded_rollout(m: Model, mesh: Mesh, nsteps: int):
    ax = mesh.axis_names[0]
    fn = jax.jit(
        partial(rollout, nsteps=nsteps),
        in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P(ax))),
        out_shardings=NamedSharding(mesh, P(ax)),
        static_argnames=(),
    )
    return fn


def exchange_body_state(dB: Data, mesh: Mesh, body_id: int):
    """Multi-instance send/receive coupling: each env instance receives the
    ring-neighbor's pose of `body_id` (TPU-native replacement for the
    reference's '_ref' mocap-weld sync over sockets, mj_sim.cpp:847-960).

    Returns (pos, quat) arrays aligned with the local env batch.
    """
    ax = mesh.axis_names[0]
    n = mesh.devices.size

    def shift(x):
        perm = [(i, (i + 1) % n) for i in range(n)]
        return jax.lax.ppermute(x, ax, perm)

    from jax.experimental.shard_map import shard_map

    f = shard_map(
        lambda p, q: (shift(p), shift(q)),
        mesh=mesh,
        in_specs=(P(ax), P(ax)),
        out_specs=(P(ax), P(ax)),
    )
    return f(dB.xpos[:, body_id], dB.xquat[:, body_id])
