"""pallas_support.support_minmax vs the XLA reference form.

Runs in pallas interpret mode on the CPU backend (the kernel itself is
gated to real TPU in the product path); covers lane padding, C/V sublane
padding, and the nested vmap(env) o vmap(slot) composition the manifold
query uses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_sim_tpu.ops.pallas_support import support_minmax


def _ref(axes, w):
    p = (axes[..., :, None, :] * w[..., None, :, :]).sum(-1)
    return p.min(-1), p.max(-1)


@pytest.mark.parametrize("C,V,N", [(324, 24, 5), (68, 24, 128),
                                   (33, 7, 200), (256, 48, 1)])
def test_matches_reference(C, V, N):
    rng = np.random.default_rng(0)
    axes = jnp.asarray(rng.normal(size=(N, C, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(N, V, 3)), jnp.float32)
    mn, mx = support_minmax(axes, w, interpret=True)
    rn, rx = _ref(axes, w)
    np.testing.assert_allclose(np.asarray(mn), np.asarray(rn), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mx), np.asarray(rx), atol=1e-6)


def test_nested_vmap_composes():
    """vmap(env) o vmap(slot) flattens onto the lane axis (the manifold
    call pattern) and matches the reference elementwise."""
    rng = np.random.default_rng(1)
    E, S, C, V = 6, 4, 40, 16
    axes = jnp.asarray(rng.normal(size=(E, S, C, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(E, S, V, 3)), jnp.float32)

    def one(a, ww):
        return support_minmax(a, ww, interpret=True)

    mn, mx = jax.vmap(jax.vmap(one))(axes, w)
    rn, rx = _ref(axes, w)
    assert mn.shape == (E, S, C)
    np.testing.assert_allclose(np.asarray(mn), np.asarray(rn), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mx), np.asarray(rx), atol=1e-6)


def test_repeat_pad_invariance():
    """V-padding repeats vertex 0 — extents must equal the unpadded
    cloud's (the vert_hi repeat-pad convention)."""
    rng = np.random.default_rng(2)
    axes = jnp.asarray(rng.normal(size=(3, 48, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 9, 3)), jnp.float32)  # pads to 16
    mn, mx = support_minmax(axes, w, interpret=True)
    rn, rx = _ref(axes, w)
    np.testing.assert_allclose(np.asarray(mn), np.asarray(rn), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mx), np.asarray(rx), atol=1e-6)
