"""End-to-end trajectory tests vs mj_step (BASELINE.md config 1 shape)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mujoco_sim_tpu import engine
from mujoco_sim_tpu.models.compile import load_model
from tests.oracle import oracle_model

REF = "/root/reference/model"


def run_oracle(mm, nsteps, qpos=None, qvel=None):
    dd = mujoco.MjData(mm)
    if qpos is not None:
        dd.qpos[:] = qpos
    if qvel is not None:
        dd.qvel[:] = qvel
    traj = []
    for _ in range(nsteps):
        mujoco.mj_step(mm, dd)
        traj.append((dd.qpos.copy(), dd.qvel.copy()))
    return traj


def run_ours(m, nsteps, qpos=None, qvel=None):
    d = engine.make_data(m)
    if qpos is not None:
        d = d.replace(qpos=jnp.asarray(qpos))
    if qvel is not None:
        d = d.replace(qvel=jnp.asarray(qvel))
    step = jax.jit(engine.step)
    traj = []
    for _ in range(nsteps):
        d = step(m, d)
        traj.append((np.asarray(d.qpos), np.asarray(d.qvel)))
    return traj


def test_pendulum_trajectory():
    """Swinging ball-joint bodies, RK4, no contact: BIT-LEVEL match.

    BASELINE.md config 1 (bit-matching single-env trajectories): the
    contact-free pipeline (FK -> com -> CRB -> RNE -> RK4) tracks the
    oracle at accumulated-rounding level — measured 1.1e-15 qpos error
    over 1000 steps (r4; the r1-r3 level-loop FK sat at ~1e-8/200).
    See RESIDUALS.md for the per-term residual attribution across
    configs."""
    path = f"{REF}/test/pendulum.xml"
    mm = oracle_model(path)
    m = load_model(path)
    n = 1000
    ours = run_ours(m, n)
    theirs = run_oracle(mm, n)
    qpos_err = max(np.max(np.abs(a[0] - b[0])) for a, b in zip(ours, theirs))
    qvel_err = max(np.max(np.abs(a[1] - b[1])) for a, b in zip(ours, theirs))
    assert qpos_err < 1e-12, f"qpos err {qpos_err}"
    assert qvel_err < 1e-12, f"qvel err {qvel_err}"


def test_ball_drop_contact():
    """Free sphere falling onto the plane: contact + friction engage."""
    path = "tests/fixtures/floor_ball.xml"
    mm = oracle_model(path)
    m = load_model(path)
    n = 400  # 2 s: falls from z=1 (radius .1) and settles
    ours = run_ours(m, n)
    theirs = run_oracle(mm, n)
    # before impact: tight; through/after impact: small tolerance
    for i in (50, 100):
        np.testing.assert_allclose(ours[i][0], theirs[i][0], atol=1e-6,
                                   err_msg=f"step {i}")
    final_mine, final_oracle = ours[-1][0], theirs[-1][0]
    np.testing.assert_allclose(final_mine, final_oracle, atol=2e-3,
                               err_msg="resting pose")
    # resting height ~= radius
    assert abs(final_mine[2] - 0.1) < 5e-3
    # velocity ~ 0 at rest
    assert np.abs(ours[-1][1]).max() < 1e-3


def test_energy_monotone_damped():
    """Damped pendulum energy decreases (sanity on energy computation)."""
    path = f"{REF}/test/pendulum.xml"
    m = load_model(path)
    d = engine.make_data(m)
    fwd = jax.jit(engine.forward)
    step = jax.jit(engine.step)
    d = fwd(m, d)
    e0 = float(d.energy.sum())
    for _ in range(100):
        d = step(m, d)
    d = fwd(m, d)
    e1 = float(d.energy.sum())
    assert e1 < e0 + 1e-9


def test_box_drop_contact():
    """Free box dropped with spin onto the plane: multi-contact manifold."""
    path = "tests/fixtures/floor_box.xml"
    mm = oracle_model(path)
    m = load_model(path)
    qvel0 = np.zeros(6)
    qvel0[3:] = [0.5, -0.3, 0.2]  # initial spin
    n = 400
    ours = run_ours(m, n, qvel=qvel0)
    theirs = run_oracle(mm, n, qvel=qvel0)
    # pre-impact flight matches tightly
    np.testing.assert_allclose(ours[40][0], theirs[40][0], atol=1e-8)
    # settles at similar height, small velocity
    zf_mine = ours[-1][0][2]
    zf_oracle = theirs[-1][0][2]
    assert abs(zf_mine - zf_oracle) < 2e-2, (zf_mine, zf_oracle)
    assert np.abs(ours[-1][1]).max() < 0.05


def test_pr2_trajectory_short():
    """PR2 with CONTACTS ON: 49 dofs, mimic equalities + limits + the
    persistent gripper-fingertip mesh-mesh contacts the oracle holds in
    equilibrium against the mimic springs (VERDICT r1 #3 done-criterion:
    50-step qpos err <= 1e-3 with contacts enabled)."""
    path = f"{REF}/test/pr2/pr2.xml"
    mm = oracle_model(path)
    m = load_model(path)
    assert m.npair_unsupported == 0
    n = 50
    ours = run_ours(m, n)
    theirs = run_oracle(mm, n)
    qpos_err = max(np.max(np.abs(a[0] - b[0])) for a, b in zip(ours, theirs))
    assert qpos_err < 1e-3, f"qpos err {qpos_err}"


def test_box_stacking():
    """Two boxes stack face-on-face (SAT normal; regression for the
    inverted box-box contact normals)."""
    xml = "tests/fixtures/stack.xml"
    with open(xml, "w") as f:
        f.write("""
<mujoco>
  <option timestep="0.005" gravity="0 0 -9.81"/>
  <worldbody>
    <geom name="floor" size="0 0 .05" type="plane"/>
    <body name="b1" pos="0 0 0.1"><freejoint/>
      <geom type="box" size=".1 .1 .1"/></body>
    <body name="b2" pos="0.03 0.02 0.32"><freejoint/>
      <geom type="box" size=".08 .08 .08"/></body>
  </worldbody>
</mujoco>""")
    m = load_model(xml)
    d = engine.make_data(m)
    step = jax.jit(engine.step)
    for _ in range(400):
        d = step(m, d)
    assert abs(float(d.qpos[2]) - 0.1) < 5e-3
    assert abs(float(d.qpos[9]) - 0.28) < 1e-2
    assert np.abs(np.asarray(d.qvel)).max() < 0.05


def test_capsule_drop():
    """Capsule falls onto the plane and rests horizontally at z=radius."""
    xml = "tests/fixtures/capsule_drop.xml"
    with open(xml, "w") as f:
        f.write("""
<mujoco>
  <option timestep="0.005" gravity="0 0 -9.81"/>
  <worldbody>
    <geom name="floor" size="0 0 .05" type="plane"/>
    <body name="cap" pos="0 0 0.5" euler="0 80 0"><freejoint/>
      <geom type="capsule" size=".05 .15"/></body>
    <body name="ball" pos="0.5 0 0.8"><freejoint/>
      <geom type="sphere" size=".06"/></body>
  </worldbody>
</mujoco>""")
    mm = oracle_model(xml)
    m = load_model(xml)
    n = 500
    ours = run_ours(m, n)
    theirs = run_oracle(mm, n)
    # capsule tips over and rests on its side at z ~ radius
    z_mine = ours[-1][0][2]
    z_oracle = theirs[-1][0][2]
    assert abs(z_mine - z_oracle) < 2e-2, (z_mine, z_oracle)
    assert abs(z_mine - 0.05) < 1e-2, z_mine


def test_cylinder_box_and_capsule_pairs():
    """Cylinder (as hull prism) and capsule pair coverage: objects stack."""
    xml = "tests/fixtures/cyl_stack.xml"
    with open(xml, "w") as f:
        f.write("""
<mujoco>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <geom name="floor" size="0 0 .05" type="plane"/>
    <body name="slab" pos="0 0 0.05"><freejoint/>
      <geom type="box" size=".3 .3 .05"/></body>
    <body name="cyl" pos="0.05 0 0.35"><freejoint/>
      <geom type="cylinder" size=".06 .1"/></body>
    <body name="cap1" pos="-0.15 0.1 0.3" euler="90 0 0"><freejoint/>
      <geom type="capsule" size=".04 .1"/></body>
    <body name="cap2" pos="-0.15 0.1 0.5" euler="90 0 0"><freejoint/>
      <geom type="capsule" size=".04 .1"/></body>
  </worldbody>
</mujoco>""")
    m = load_model(xml)
    assert m.npair_unsupported == 0
    d = engine.make_data(m)

    @jax.jit
    def roll(m_, d_):
        return jax.lax.fori_loop(0, 1000,
                                 lambda i, dd: engine.step(m_, dd), d_)

    d = roll(m, d)
    q = np.asarray(d.qpos)
    assert np.isfinite(q).all()
    # slab on floor; upright cylinder on slab top (0.1 + 0.1 = 0.2)
    assert abs(q[2] - 0.05) < 5e-3
    z_cyl = q[9]
    assert abs(z_cyl - 0.2) < 2e-2, z_cyl
    # capsules: one on slab (z ~ 0.1+0.04), second resting on/beside first
    z1 = q[16]
    assert 0.1 < z1 < 0.2, z1


def test_box_box_edge_edge():
    """Two 45-deg-rotated long boxes crossed 90 deg in yaw: the upper one
    rests ridge-on-ridge — only the edge-edge SAT axes produce this contact
    (VERDICT r1 #3; mj_collideBox cross-axis case)."""
    xml = "tests/fixtures/edge_edge.xml"
    with open(xml, "w") as f:
        f.write("""
<mujoco>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <geom name="floor" size="0 0 .05" type="plane"/>
    <body name="ridge" pos="0 0 0.141" euler="45 0 0">
      <geom type="box" size=".4 .1 .1"/></body>
    <body name="top" pos="0 0 0.5" euler="0 45 90"><freejoint/>
      <geom type="box" size=".3 .08 .08"/></body>
  </worldbody>
</mujoco>""")
    mm = oracle_model(xml)
    m = load_model(xml)
    n = 400
    ours = run_ours(m, n)
    theirs = run_oracle(mm, n)
    z_mine = ours[-1][0][2]
    z_oracle = theirs[-1][0][2]
    # rests on the ridge edge, well above the floor
    assert z_mine > 0.2, z_mine
    assert abs(z_mine - z_oracle) < 3e-2, (z_mine, z_oracle)
    assert np.abs(ours[-1][1]).max() < 0.1


def test_noslip_matches_oracle():
    """noslip post-solver: lateral drift under sub-threshold push is
    suppressed to the oracle's value (the reference's controller world sets
    noslip_iterations=5, model/ontology/scene.xml:2-3; VERDICT r1 #4)."""
    xml = "tests/fixtures/noslip_box.xml"
    with open(xml, "w") as f:
        f.write("""
<mujoco>
  <option timestep="0.005" gravity="0 0 -9.81" noslip_iterations="5"
          noslip_tolerance="1e-6"/>
  <worldbody>
    <geom name="floor" size="0 0 .05" type="plane"/>
    <body name="box" pos="0 0 0.0995"><freejoint/>
      <geom type="box" size=".1 .1 .1" friction="0.4"/></body>
  </worldbody>
</mujoco>""")
    mm = oracle_model(xml)
    assert mm.opt.noslip_iterations == 5
    m = load_model(xml)
    assert m.opt.noslip_iterations == 5
    dd = mujoco.MjData(mm)
    d = engine.make_data(m)
    step = jax.jit(engine.step)
    push = jnp.asarray([0, 0, 0, 20.0, 0, 0.0])  # [torque, force]
    for _ in range(200):
        dd.xfrc_applied[1, :3] = [20.0, 0, 0]
        mujoco.mj_step(mm, dd)
        d = d.replace(xfrc_applied=d.xfrc_applied.at[1, :].set(push))
        d = step(m, d)
    # noslip holds the box nearly still; x matches oracle tightly
    assert abs(float(d.qpos[0]) - dd.qpos[0]) < 1e-5
    assert abs(float(d.qpos[0])) < 1e-4  # drift suppressed (vs 1.3e-3 w/o)
    np.testing.assert_allclose(np.asarray(d.qpos), dd.qpos, atol=5e-5)
    # qacc-level parity from identical fresh states: our sequential GS
    # equals mj_solNoSlip
    import jax as _jax
    dd2 = mujoco.MjData(mm)
    dd2.qvel[0] = 0.05
    dd2.xfrc_applied[1, :3] = [20.0, 0, 0]
    mujoco.mj_forward(mm, dd2)
    d2 = engine.make_data(m)
    d2 = d2.replace(xfrc_applied=d2.xfrc_applied.at[1, :].set(push),
                    qvel=d2.qvel.at[0].set(0.05))
    d2 = _jax.jit(engine.forward)(m, d2)
    np.testing.assert_allclose(np.asarray(d2.qacc), dd2.qacc, atol=1e-9)


def test_implicit_integrators_match_oracle():
    """mj_implicit / mj_implicitFast parity: the velocity-derivative comes
    from forward-mode AD of ops/smooth.rne instead of MuJoCo's hand-written
    mjd_smooth_vel; a damped double pendulum (hinge + ball) matches to
    machine precision over 200 steps."""
    for integ in ("implicitfast", "implicit"):
        xml = f"tests/fixtures/implicit_{integ}.xml"
        with open(xml, "w") as f:
            f.write(f"""
<mujoco>
  <option timestep="0.005" gravity="0 0 -9.81" integrator="{integ}"/>
  <worldbody>
    <body pos="0 0 1"><joint name="j1" type="hinge" axis="0 1 0"
                             damping="0.3"/>
      <geom type="capsule" size=".04 .2" pos="0.2 0 0" euler="0 90 0"/>
      <body pos="0.4 0 0"><joint name="j2" type="ball" damping="0.1"/>
        <geom type="capsule" size=".03 .15" pos="0.15 0 0" euler="0 90 0"/>
      </body>
    </body>
  </worldbody>
</mujoco>""")
        mm = oracle_model(xml)
        m = load_model(xml)
        n = 200
        qvel0 = np.zeros(mm.nv)
        qvel0[0] = 1.0
        ours = run_ours(m, n, qvel=qvel0)
        theirs = run_oracle(mm, n, qvel=qvel0)
        err = max(np.max(np.abs(a[0] - b[0])) for a, b in zip(ours, theirs))
        assert err < 1e-10, (integ, err)


@pytest.mark.parametrize("exact,band", [(0, 2.5e-3), (1, 2.5e-3)])
def test_manip_scene_parity(exact, band):
    """Config-5 manipulation fixture (tests/fixtures/manip_bin6.xml: 6-dof
    gravcomp arm + >=20-vert convex hulls in a bin) tracks the oracle for
    50 stirred steps from the oracle-settled state (VERDICT r3 #6: the
    bench scene must be a real manipulation workload WITH a parity test).
    Measured r5: 8.5e-4 default / 1.3e-3 exact at step 50 — but the
    per-step error is NON-monotone chaos (r5 probe: it peaks ~1.4e-3 at
    step 5 in BOTH the r4 and r5 f.p. orderings, then wanders 0.8-1.3e-3),
    so both modes get the same 2.5e-3 envelope rather than a band tuned
    to one ordering's step-50 sample.  The settled start matters:
    drop-impact transients on near-flat support polygons diverge by the
    support-vertex pick, not physics — mujoco's plane-convex picks c0 by
    a graph hill-climb whose plateau stop is path-dependent (probed,
    scripts/probe_planeconvex.py), while we take the deepest vertex; on
    tied flat faces the two legitimately differ."""
    import mujoco
    path = "tests/fixtures/manip_bin6.xml"
    mm = oracle_model(path)
    dd = mujoco.MjData(mm)
    for _ in range(4000):                     # oracle-settled start
        mujoco.mj_step(mm, dd)
    q0, v0 = dd.qpos.copy(), dd.qvel.copy()
    dd = mujoco.MjData(mm)
    dd.qpos[:] = q0
    dd.qvel[:] = v0
    m = load_model(path)
    if exact:
        m = m.replace(opt=m.opt.replace(exact_meshcollide=1))
    d = engine.make_data(m).replace(qpos=jnp.asarray(q0),
                                    qvel=jnp.asarray(v0))
    step = jax.jit(engine.step)
    rng = np.random.RandomState(7)
    phase = rng.uniform(0, 6.28, mm.nu)
    for _ in range(50):
        ctrl = 0.5 * np.sin(3.0 * dd.time + phase)
        dd.ctrl[:] = ctrl
        mujoco.mj_step(mm, dd)
        d = step(m, d.replace(ctrl=jnp.asarray(ctrl)))
    err = np.abs(np.asarray(d.qpos) - dd.qpos).max()
    assert np.isfinite(np.asarray(d.qpos)).all()
    assert err < band, err
