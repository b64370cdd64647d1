"""Failure detection + elastic recovery for batched envs.

The reference has no failure handling beyond retry/timeouts (SURVEY §5);
for production fleets of thousands of envs we add: per-env divergence
detection (non-finite state or exploding velocities) and in-place auto-reset
of only the diverged envs — the batch keeps running, healthy envs untouched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_sim_tpu import engine
from mujoco_sim_tpu.models.model import Model, Data


def env_healthy(d: Data, qvel_limit: float = 1e6) -> jax.Array:
    """Per-env boolean (batched Data -> (B,) mask)."""
    finite = (jnp.isfinite(d.qpos).all(axis=-1)
              & jnp.isfinite(d.qvel).all(axis=-1))
    bounded = jnp.abs(d.qvel).max(axis=-1) < qvel_limit
    return finite & bounded


def contact_saturated(m: Model, d: Data) -> jax.Array:
    """True where the narrowphase found more active contacts than the
    compiled ncon_max budget — the top-K compaction silently dropped the
    shallowest ones (ops/collision.py).  Surfaced so fleets can flag
    under-budgeted scenes instead of quietly losing contacts."""
    return d.ncon > m.ncon_max


def auto_reset(m: Model, dB: Data, qvel_limit: float = 1e6):
    """Replace diverged envs with fresh make_data state; report the mask.

    Returns (dB', healthy_mask).  Healthy envs are bit-identical.
    """
    healthy = env_healthy(dB, qvel_limit)
    fresh = engine.make_data(m, dB.qpos.dtype)

    def mend(batched, clean):
        if batched.ndim == 0:
            return batched
        mask = healthy.reshape((-1,) + (1,) * (batched.ndim - 1))
        return jnp.where(mask, batched, clean[None])

    dB2 = jax.tree.map(mend, dB, jax.tree.map(jnp.asarray, fresh))
    return dB2, healthy
