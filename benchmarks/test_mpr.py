"""Batched MPR penetration vs analytic MTVs and the oracle's GJK/EPA.

benchmarks/mpr.py re-implements libccd's ccdMPRPenetration (the narrowphase the
reference's MuJoCo 2.3.7 backend used for convex pairs) with fixed
-iteration while_loops and one-hot supports.  MPR's depth/direction is
the exact MTV for vertex-face dominated contact; edge-edge MTVs can be
slightly conservative, so the random sweep uses a small tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mujoco

from benchmarks.mpr import mpr_penetration

CUBE = np.array([[sx, sy, sz] for sx in (-.5, .5) for sy in (-.5, .5)
                 for sz in (-.5, .5)])
MASK = np.ones(8)


@pytest.mark.parametrize("off,depth,axis", [
    ([0.7, 0, 0], 0.3, [1, 0, 0]),
    ([0, 0, 0.9], 0.1, [0, 0, 1]),
    ([0.55, 0.55, 0], 0.45, [1, 0, 0]),
    ([0.2, 0.05, -0.02], 0.8, [1, 0, 0]),
])
def test_cube_mtv_analytic(off, depth, axis):
    f = jax.jit(mpr_penetration)
    d, n, p = f(jnp.asarray(CUBE), jnp.asarray(MASK),
                jnp.asarray(CUBE + np.asarray(off, float)),
                jnp.asarray(MASK))
    assert abs(float(d) - depth) < 1e-5
    assert abs(abs(float((n * jnp.asarray(np.asarray(axis, float))).sum()))
               - 1.0) < 1e-4


def test_separated_reports_miss():
    f = jax.jit(mpr_penetration)
    d, _, _ = f(jnp.asarray(CUBE), jnp.asarray(MASK),
                jnp.asarray(CUBE + [1.2, 0.4, 0.0]), jnp.asarray(MASK))
    assert float(d) == -1.0


def _random_hull(rng, n=12, scale=0.3):
    v = rng.standard_normal((n, 3)) * scale
    return v


def test_random_hulls_vs_oracle():
    """random convex pairs, moderate penetration: depth matches the
    oracle's native GJK/EPA within 2 mm and the direction within ~8 deg
    (MPR is exact for vertex-face MTVs, conservative on edge-edge)."""
    rng = np.random.default_rng(11)
    f = jax.jit(mpr_penetration)

    def oracle_contact(va, vb, offs):
        vert_a = " ".join(f"{x:.6f}" for x in va.ravel())
        vert_b = " ".join(f"{x:.6f}" for x in vb.ravel())
        xml = f"""
        <mujoco>
          <asset><mesh name="ma" vertex="{vert_a}"/>
                 <mesh name="mb" vertex="{vert_b}"/></asset>
          <worldbody>
            <body pos="0 0 0"><freejoint/>
              <geom type="mesh" mesh="ma"/></body>
            <body pos="{offs[0]} {offs[1]} {offs[2]}"><freejoint/>
              <geom type="mesh" mesh="mb"/></body>
          </worldbody>
        </mujoco>
        """
        mo = mujoco.MjModel.from_xml_string(xml)
        do = mujoco.MjData(mo)
        mujoco.mj_forward(mo, do)
        if do.ncon == 0:
            return None
        i = int(np.argmin([do.contact[k].dist for k in range(do.ncon)]))
        return do.contact[i].dist, do.contact[i].frame[:3].copy()

    checked = 0
    aligned = 0
    for trial in range(20):
        va = _random_hull(rng)
        vb = _random_hull(rng)
        u = rng.standard_normal(3)
        u = u / np.linalg.norm(u)
        ra = (va @ u).max()
        rb = (vb @ -u).max()
        # shrink the separation until the hulls actually touch shallowly
        hit = None
        for k in np.linspace(0.99, 0.55, 23):
            offs = u * (ra + rb) * k
            got = oracle_contact(va, vb, offs)
            if got is not None and got[0] < -1e-4:
                hit = (offs, got)
                break
        d, n, p = f(jnp.asarray(va, jnp.float64), jnp.ones(len(va)),
                    jnp.asarray(vb + (hit[0] if hit else u * 3.0),
                                jnp.float64), jnp.ones(len(vb)))
        if hit is None:
            assert float(d) == -1.0     # MPR must agree on the miss
            continue
        dist, frame_n = hit[1]
        if dist < -0.08:
            continue                    # deep: MPR may legally differ
        assert float(d) >= 0.0, f"trial {trial}: MPR missed a contact"
        assert abs(float(d) + dist) < 2e-3, (trial, float(d), dist)
        # (depth, dir) must be a true separator: the Minkowski-difference
        # support along dir equals the reported depth
        nn = np.asarray(n)
        h = (va @ nn).max() - ((vb + hit[0]) @ nn).min()
        assert abs(h - float(d)) < 1e-6, (trial, h, float(d))
        # our dir matches mujoco's contact frame normal (geom1 -> geom2);
        # near edges several directions tie on depth, so exact alignment
        # is only required for the majority
        align = float((n * jnp.asarray(frame_n)).sum())
        aligned += align > 0.98
        checked += 1
    assert checked >= 8, f"only {checked} usable random trials"
    assert aligned >= 0.7 * checked, (aligned, checked)
