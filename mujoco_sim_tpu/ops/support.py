"""Force projection helpers (mj_applyFT / xfrc accumulation equivalents)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_sim_tpu.models.model import Model


def xfrc_accumulate(m: Model, com: dict, xipos: jax.Array,
                    xfrc_applied: jax.Array) -> jax.Array:
    """Project per-body Cartesian wrenches [torque, force] applied at body
    COM into joint space (mj_xfrcAccumulate equivalent)."""
    dtype = xfrc_applied.dtype
    torque = xfrc_applied[:, :3]
    force = xfrc_applied[:, 3:]
    # spatial force at the body's c-frame origin
    r = xipos - com["origin"]
    tau_o = torque + jnp.cross(r, force)
    F = jnp.concatenate([tau_o, force], axis=-1)  # (nbody, 6)
    mask = jnp.asarray(m.ancestor_mask, dtype)
    return jnp.einsum("du,bu,bd->d", com["cdof"], F, mask)


def apply_ft(m: Model, com: dict, force: jax.Array, torque: jax.Array,
             point: jax.Array, body_id) -> jax.Array:
    """qfrc from a wrench applied at a world point on one body (mj_applyFT)."""
    dtype = force.dtype
    O = com["origin"][body_id]
    tau_o = torque + jnp.cross(point - O, force)
    F = jnp.concatenate([tau_o, force], axis=-1)
    mask = jnp.asarray(m.ancestor_mask, dtype)[body_id]
    return jnp.einsum("du,u->d", com["cdof"], F) * mask
