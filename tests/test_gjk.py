"""Point-vs-hull GJK distance (ops/gjk.py) and the corner-region phantom
fix in sphere/capsule-vs-mesh narrowphase.

The max-plane sdf underestimates the distance of outside points in
edge/vertex Voronoi regions (it measures to the supporting PLANE), which
spawned phantom contacts: ridgeback's arm sphere vs base hull read
-5.3 mm where the oracle (mujoco 3.10 GJK/EPA narrowphase behind
mj_step1, SURVEY.md §2.2) saw no contact."""

import jax
import jax.numpy as jnp
import numpy as np

import mujoco

from mujoco_sim_tpu import engine
from mujoco_sim_tpu.engine import set_const
from mujoco_sim_tpu.models.compile import compile_spec
from mujoco_sim_tpu.models.mjcf import parse_mjcf_string
from mujoco_sim_tpu.ops.gjk import point_hull_closest

CUBE = np.array([[sx, sy, sz] for sx in (-.5, .5) for sy in (-.5, .5)
                 for sz in (-.5, .5)])


def test_cube_regions_analytic():
    f = jax.jit(point_hull_closest)
    m = jnp.ones(8)
    d, p = f(jnp.asarray([0.0, 0.0, 2.0]), jnp.asarray(CUBE), m)
    assert abs(float(d) - 1.5) < 1e-12
    d, p = f(jnp.asarray([1.0, 1.0, 0.0]), jnp.asarray(CUBE), m)
    assert abs(float(d) - np.sqrt(2) * 0.5) < 1e-12
    d, p = f(jnp.asarray([2.0, 2.0, 2.0]), jnp.asarray(CUBE), m)
    assert abs(float(d) - np.sqrt(3) * 1.5) < 1e-12


def test_random_hulls_support_optimal():
    """For outside points the returned distance must be support-optimal:
    d >= every sampled support-plane lower bound, and the witness point's
    own support plane certifies it exactly."""
    rng = np.random.default_rng(0)
    f = jax.jit(point_hull_closest)
    checked = 0
    for t in range(60):
        V = rng.standard_normal((12, 3)) * 0.4
        q = rng.standard_normal(3) * 1.2
        d, p = f(jnp.asarray(q), jnp.asarray(V), jnp.ones(12))
        d = float(d)
        p = np.asarray(p)
        U = rng.standard_normal((500, 3))
        U /= np.linalg.norm(U, axis=1, keepdims=True)
        lb = (U @ q - (V @ U.T).max(0)).max()
        if lb <= 1e-9:
            continue  # inside: callers gate these out via the plane sdf
        u = (q - p) / max(d, 1e-12)
        sup_gap = (V @ u).max() - p @ u
        assert d >= lb - 1e-9, (t, d, lb)
        assert abs(sup_gap) < 1e-8, (t, sup_gap)
        checked += 1
    assert checked >= 40


def test_disabled_lanes_exit_immediately():
    vf = jax.jit(jnp.vectorize(point_hull_closest,
                               signature='(d),(v,d),(v),()->(),(d)'))
    rng = np.random.default_rng(1)
    V = jnp.asarray(rng.standard_normal((16, 8, 3)))
    Q = jnp.asarray(rng.standard_normal((16, 3)))
    d, p = vf(Q, V, jnp.ones((16, 8)), jnp.zeros(16, bool))
    assert np.isfinite(np.asarray(d)).all()  # no NaNs from skipped lanes


CORNER_XML = """
<mujoco>
  <asset><mesh name="cube" vertex="-.5 -.5 -.5  -.5 -.5 .5  -.5 .5 -.5
    -.5 .5 .5  .5 -.5 -.5  .5 -.5 .5  .5 .5 -.5  .5 .5 .5"/></asset>
  <worldbody>
    <geom type="mesh" mesh="cube"/>
    <body pos="{x} {x} {x}">
      <freejoint/>
      <geom type="{gtype}" size="{size}"/>
    </body>
  </worldbody>
</mujoco>
"""


def _corner_case(gtype, size, x):
    xml = CORNER_XML.format(gtype=gtype, size=size, x=x)
    m = set_const(compile_spec(parse_mjcf_string(xml)))
    d = engine.make_data(m)
    d = jax.jit(engine.step)(m, d)
    mo = mujoco.MjModel.from_xml_string(xml)
    do = mujoco.MjData(mo)
    mujoco.mj_forward(mo, do)
    return d, do


def test_sphere_corner_no_phantom():
    """Sphere diagonally off the cube corner: plane sdf reads
    0.577*|q-c| < r (phantom -0.11), true gap is +0.02."""
    # corner at (.5,.5,.5); body at x=0.6847 -> diag distance 0.32
    d, do = _corner_case("sphere", 0.3, 0.5 + 0.32 / np.sqrt(3))
    assert do.ncon == 0  # oracle agrees there is no contact
    assert not bool(np.asarray(d.contact.active).any()), \
        np.asarray(d.contact.dist)


def test_capsule_corner_no_phantom():
    d, do = _corner_case("capsule", "0.25 0.2", 0.5 + 0.38 / np.sqrt(3))
    ncon_real = sum(1 for i in range(do.ncon)
                    if do.contact[i].dist < 0)
    assert ncon_real == 0
    act = np.asarray(d.contact.active)
    dist = np.asarray(d.contact.dist)
    assert not (act & (dist < 0)).any(), dist


def test_sphere_corner_touching_matches_oracle():
    """Moved inward until it really touches: dist must match the oracle's
    GJK/EPA depth (the refined normal is the corner diagonal)."""
    d, do = _corner_case("sphere", 0.3, 0.5 + 0.27 / np.sqrt(3))
    assert do.ncon >= 1
    act = np.asarray(d.contact.active)
    assert act.any()
    ours = float(np.asarray(d.contact.dist)[act].min())
    theirs = float(min(do.contact[i].dist for i in range(do.ncon)))
    assert abs(ours - theirs) < 1e-6, (ours, theirs)
