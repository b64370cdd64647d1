"""Benchmarks on the attached TPU chip (BASELINE.md configs).

Prints ONE JSON line on stdout (the driver's headline metric) carrying
EVERY scenario's rate as extra keys:
  {"metric": "env_steps_per_sec_per_chip", "value": <box rate>,
   "unit": "env-steps/s", "vs_baseline": N/1e6,
   "mobile": R, "pr2": R, "pr2_ms_wall": M, "spawn": R, "manip": R,
   "manip_8k": R, "nenv": {scen: N}, "mfu": {scen: frac},
   "hbm_util": {scen: frac}, "stale": [names...]}

mfu / hbm_util are roofline fractions from XLA's compiled cost analysis
(flops / bytes-accessed per rollout over the best measured wall time)
against v5e peaks (197 TFLOP/s bf16 MXU, 819 GB/s HBM) — they quantify
whether a scenario is compute- or bandwidth-bound (VERDICT r4 weak #4).

vs_baseline = fraction of the 1M env-steps/s aggregate target (BASELINE.md)
achieved on this single chip at 4096 envs.

Scenarios (BENCH_SCENARIO env var; default "all"):
  box    free box on the floor (SMOKE), 4096 envs — headline `value`
  mobile mobile base (odom-driven) + 3-dof PD arm, 1024 envs   — config 3
  pr2    PR2 robot in the world, 256 envs                       — config 2
  spawn  4 spawnable robots/env, half the slots active, 4096    — config 4
  manip  6-dof arm stirring mesh objects in a bin, 1024         — config 5
  manip_8k  the manip scene at the single-chip scale point (8192 envs;
            BASELINE's 65536 needs 45.9G HBM vs 15.75G — see _SCEN_FNS)
  all    (default) run everything

Each scenario runs in its own watchdogged subprocess and writes its
result into .bench_cache.json as it lands; the final headline line is
assembled from the cache, so a hang or timeout in one scenario cannot
blank the others — missing/old entries fall back to the last good
measurement and are named in the "stale" list.
"""

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".jax_cache"))

import jax.numpy as jnp  # noqa: E402


def _batch(m, d, nenv, jitter=True):
    dB = jax.tree.map(lambda x: jnp.broadcast_to(x, (nenv,) + x.shape), d)
    if jitter:
        key = jax.random.PRNGKey(0)
        dz = jax.random.uniform(key, (nenv,), minval=0.0, maxval=0.1)
        dB = dB.replace(qpos=dB.qpos.at[:, 2].add(dz))
    return dB


_V5E_PEAK_FLOPS = 197e12  # bf16 MXU peak, one v5e chip
_V5E_PEAK_HBM = 819e9     # bytes/s


def _cost_analysis(run, m, dB):
    """XLA compiled-cost totals {flops, bytes} for ONE STEP of the rollout.

    XLA's HLO cost analysis counts a while/scan body ONCE, not x trip
    count (probed: a 100-iter scan over a 256 matmul reports exactly
    2*256^3 flops), so the dispatch-level numbers ARE per-step numbers
    for our nsteps-scan rollouts.  Nested dynamic loops (the Newton
    solver while) are also counted once, so these are LOWER bounds on
    true per-step traffic — fine for a roofline fraction, not a
    hardware counter."""
    try:
        ca = run.lower(m, dB).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax returns [dict]
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        nbytes = float(ca.get("bytes accessed", 0.0))
        if flops <= 0 and nbytes <= 0:
            return None
        return {"flops": flops, "bytes": nbytes}
    except Exception:
        return None


def _time_rollout(run, m, dB, nenv, nsteps, reps=3):
    """One warmup dispatch, then best-of-`reps` timed rollouts.  Rollouts
    are long enough that the axon tunnel's round-trip amortizes below ~10%,
    and best-of-reps rides out congestion: the tunneled chip is TIME-SHARED
    with other tenants, and identical rollouts measured 4.6-28.7 ms/step
    minutes apart (r2); only the quiet-window minimum reflects the code.

    Returns (rate, best_dt, roofline) where roofline carries achieved-vs-
    peak fractions (mfu, hbm_util) when XLA cost analysis is available."""
    out = run(m, dB)
    jax.block_until_ready(out.qpos)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = run(m, out)
        jax.block_until_ready(out.qpos)
        best = min(best, time.time() - t0)
    roof = None
    cost = _cost_analysis(run, m, dB)
    if cost:
        # cost is per-step (while bodies counted once); a dispatch runs
        # nsteps of them in `best` seconds
        roof = {
            "mfu": cost["flops"] * nsteps / best / _V5E_PEAK_FLOPS,
            "hbm_util": cost["bytes"] * nsteps / best / _V5E_PEAK_HBM,
            "flops_per_step": cost["flops"],
            "bytes_per_step": cost["bytes"],
        }
    return nenv * nsteps / best, best, roof


def bench_box(nenv=None, nsteps=1000):
    """Headline smoke scenario: ONE free box on a plane (<= 1 contact
    pair) at 4096 envs — measures the raw step pipeline, not contact
    richness; bench_manip is the contact-rich manipulation number."""
    from mujoco_sim_tpu import engine
    from mujoco_sim_tpu.models.compile import load_model
    from mujoco_sim_tpu.parallel import mesh as pmesh

    nenv = nenv or int(os.environ.get("BENCH_NENV", 4096))
    m = load_model(os.path.join(_REPO, "tests/fixtures/floor_box.xml"))
    m = engine.put_model(m, jnp.float32)
    d = engine.make_data(m, jnp.float32)
    dB = _batch(m, d, nenv, jitter=False)
    key = jax.random.PRNGKey(0)
    dB = dB.replace(
        qpos=dB.qpos.at[:, 2].add(
            jax.random.uniform(key, (nenv,), minval=0.0, maxval=0.3)),
        qvel=dB.qvel.at[:, 3:6].set(
            jax.random.uniform(key, (nenv, 3), minval=-0.5, maxval=0.5)))
    run = jax.jit(lambda mm, dd: pmesh.rollout(mm, dd, nsteps, full_final=False))
    rate, dt, roof = _time_rollout(run, m, dB, nenv, nsteps)
    return {"scenario": "box", "nenv": nenv, "rate": rate, "roofline": roof}


def _mobile_model():
    from mujoco_sim_tpu.engine import set_const
    from mujoco_sim_tpu.models import scene
    from mujoco_sim_tpu.models.compile import compile_spec

    bot = os.path.join(_REPO, "tests/fixtures/benchbot.xml")
    if not os.path.exists(bot):
        with open(bot, "w") as f:
            f.write("""
<mujoco model="benchbot">
  <worldbody>
    <body name="benchbot" pos="0 0 0.15">
      <geom type="box" size=".25 .2 .1" mass="20"/>
      <body name="arm1" pos="0.1 0 0.15">
        <joint name="a1" type="hinge" axis="0 0 1" damping="1"/>
        <geom type="box" size=".04 .04 .15" pos="0 0 .15" mass="2"/>
        <body name="arm2" pos="0 0 0.3">
          <joint name="a2" type="hinge" axis="0 1 0" damping="1"/>
          <geom type="box" size=".03 .03 .12" pos="0 0 .12" mass="1"/>
          <body name="wrist" pos="0 0 0.26">
            <joint name="a3" type="hinge" axis="0 1 0" damping="0.5"/>
            <geom type="sphere" size=".05" mass="0.5"/>
          </body>
        </body>
      </body>
    </body>
  </worldbody>
</mujoco>""")
    world = scene.compose(
        "/root/reference/model/world/empty.xml",
        robots={"benchbot": scene.RobotConfig(
            path=bot,
            add_odom_joints={"lin_odom_x_joint": True,
                             "lin_odom_y_joint": True,
                             "ang_odom_z_joint": True})})
    return set_const(compile_spec(world))


def bench_mobile(nenv=1024, nsteps=500, reps=5):
    """Config 3: base velocity control + PD arm, batched (Euler: the
    world's RK4 default quadruples solver passes per step)."""
    from mujoco_sim_tpu import engine
    from mujoco_sim_tpu.control import controllers as C
    from mujoco_sim_tpu.models.model import Integrator
    from mujoco_sim_tpu.parallel import mesh as pmesh

    m = _mobile_model()
    m = m.replace(opt=m.opt.replace(integrator=int(Integrator.EULER)))
    m32 = engine.put_model(m, jnp.float32)
    ocfg = C.odom_config(m, "benchbot")
    pdc = C.pd_config_for_joints(m32, ["a1", "a2", "a3"], kp=80.0, kd=8.0)
    d = engine.make_data(m32, jnp.float32)
    st = C.make_pd_state(m32, jnp.float32)
    qdes = jnp.zeros(m.nv, jnp.float32)
    cmd = jnp.asarray([0.4, 0.0, 0.0, 0.0, 0.0, 0.3], jnp.float32)

    def one_env_step(m_, carry):
        d_, st_ = carry
        d_ = engine.step1(m_, d_)
        st2 = C.pd_accel(pdc, st_, d_, qdes, m_.opt.timestep)
        d_, st3 = C.apply_control(m_, d_, st2, pdc.ctrl_mask)
        d_ = C.set_odom_vels(m_, d_, ocfg, cmd)
        d_ = engine.step2(m_, d_)
        return d_, st3

    dB = _batch(m32, d, nenv, jitter=False)
    stB = jax.tree.map(lambda x: jnp.broadcast_to(x, (nenv,) + x.shape), st)

    @jax.jit
    def run(m_, dB_):
        step = jax.vmap(lambda dd, ss: one_env_step(m_, (dd, ss)),
                        in_axes=(0, 0))
        dB_, _ = pmesh.scan_reduced(lambda c: step(c[0], c[1]),
                                    (dB_, stB), nsteps)
        return dB_

    rate, dt, roof = _time_rollout(run, m32, dB, nenv, nsteps, reps=reps)
    return {"scenario": "mobile", "nenv": nenv, "rate": rate, "roofline": roof}


def bench_pr2(nenv=256, nsteps=100, reps=10):
    """Config 2: PR2 (49 dof, mimic equalities), batched at the VERDICT r1
    done-criterion env count.  Short rollouts -> many reps (~0.3 s each) to
    catch a quiet window on the shared chip."""
    from mujoco_sim_tpu import engine
    from mujoco_sim_tpu.models import scene
    from mujoco_sim_tpu.models.compile import compile_spec
    from mujoco_sim_tpu.engine import set_const
    from mujoco_sim_tpu.parallel import mesh as pmesh

    world = scene.compose(
        "/root/reference/model/world/empty.xml",
        robots={"pr2": scene.RobotConfig(
            path="/root/reference/model/test/pr2/pr2.xml",
            pose_init=np.array([0.0, 0.0, 0.05, 0, 0, 0]))})
    from mujoco_sim_tpu.models.model import Integrator
    m = set_const(compile_spec(world))
    m = m.replace(opt=m.opt.replace(integrator=int(Integrator.EULER)))
    m32 = engine.put_model(m, jnp.float32)
    d = engine.make_data(m32, jnp.float32)
    dB = _batch(m32, d, nenv, jitter=False)
    run = jax.jit(lambda mm, dd: pmesh.rollout(mm, dd, nsteps, full_final=False))
    rate, dt, roof = _time_rollout(run, m32, dB, nenv, nsteps, reps=reps)
    return {"scenario": "pr2", "nenv": nenv, "rate": rate, "roofline": roof}


def bench_spawn(nenv=4096, nsteps=500, reps=5):
    """Config 4: masked spawn slots, half active."""
    from mujoco_sim_tpu import engine
    from mujoco_sim_tpu.models import scene
    from mujoco_sim_tpu.models.compile import compile_spec
    from mujoco_sim_tpu.engine import set_const
    from mujoco_sim_tpu.parallel import mesh as pmesh

    world = scene.compose(
        "/root/reference/model/world/empty.xml",
        robots={"sball": scene.RobotConfig(
            path=os.path.join(_REPO, "tests/fixtures/spawn_ball.xml"))},
        instances=4)
    from mujoco_sim_tpu.models.model import Integrator
    m = set_const(compile_spec(world))
    m = m.replace(opt=m.opt.replace(integrator=int(Integrator.EULER)))
    m32 = engine.put_model(m, jnp.float32)
    d = engine.make_data(m32, jnp.float32)
    # half the slots inactive
    ba = np.ones(m.nbody, dtype=bool)
    for i, name in enumerate(m.names.body):
        if name.startswith(("2_", "3_")):
            ba[i] = False
    d = d.replace(body_active=jnp.asarray(ba))
    dB = _batch(m32, d, nenv)
    run = jax.jit(lambda mm, dd: pmesh.rollout(mm, dd, nsteps, full_final=False))
    rate, dt, roof = _time_rollout(run, m32, dB, nenv, nsteps, reps=reps)
    return {"scenario": "spawn", "nenv": nenv, "rate": rate, "roofline": roof}


def bench_manip(nenv=1024, nsteps=300, reps=5):
    """Config 5 single-chip analogue (BASELINE.md contact-rich
    manipulation): a 6-dof arm stirring 6 free convex-mesh objects
    (24-vert tumblers, 20-vert rock dodecahedra, cubes) inside a bin —
    mesh-mesh object pairs, object-bin, object-arm and floor contacts all
    live at once, on real >=20-vert hulls (tests/fixtures/manip_bin6.xml;
    the r3 scene's 8-vert cubes barely stressed the hull narrowphase).
    The box scenario is a SMOKE test by comparison (<= 1 contact pair);
    this is the number that reflects manipulation workloads.

    nenv=1024 is the measured single-chip sweet spot: the step is
    bandwidth-bound on the dense (nenv, nefc, nv) efc rows (60.0k
    env-steps/s at 1024 vs 47.8k at 2048 and 32.9k at 4096, r4), and
    the scene caps the row count via <size nconmax="32"> (max observed
    ncon is 22 over 500 stirred steps)."""
    from mujoco_sim_tpu import engine
    from mujoco_sim_tpu.models.compile import load_model
    from mujoco_sim_tpu.models.model import Integrator
    from mujoco_sim_tpu.parallel import mesh as pmesh

    fx = os.path.join(_REPO, "tests/fixtures/manip_bin6.xml")
    m = load_model(fx)
    m = m.replace(opt=m.opt.replace(integrator=int(Integrator.EULER)))
    m32 = engine.put_model(m, jnp.float32)
    d = engine.make_data(m32, jnp.float32)
    dB = _batch(m32, d, nenv, jitter=False)
    key = jax.random.PRNGKey(1)
    phase = jax.random.uniform(key, (nenv, m.nu), maxval=6.28)

    def one_step(m_, d_, ph):
        ctrl = jnp.sin(4.0 * d_.time + ph)  # stir
        return engine.step(m_, d_.replace(ctrl=ctrl))

    @jax.jit
    def run(m_, dB_):
        step = jax.vmap(lambda dd, ph: one_step(m_, dd, ph),
                        in_axes=(0, 0))
        dB_, _ = pmesh.scan_reduced(lambda c: (step(c[0], phase), c[1]),
                                    (dB_, 0), nsteps)
        return dB_

    rate, dt, roof = _time_rollout(run, m32, dB, nenv, nsteps, reps=reps)
    return {"scenario": "manip", "nenv": nenv, "rate": rate, "roofline": roof}


_CACHE = os.path.join(_REPO, ".bench_cache.json")

_SCEN_FNS = {
    "box": lambda: bench_box(),
    "mobile": lambda: bench_mobile(),
    "pr2": lambda: bench_pr2(),
    "spawn": lambda: bench_spawn(),
    "manip": lambda: bench_manip(),
    # BASELINE config-5 names 65536 envs; the r4 scene at 65536 envs needs
    # 45.9 GB HBM (XLA compile-time report; the dense per-env efc rows
    # dominate) vs the chip's 15.75 GB -> single-chip ceiling ~21k envs,
    # and the step is already BANDWIDTH-bound by 4096 envs (measured:
    # 32.9k env-steps/s @4096 vs 28.8k @8192 — bigger batches don't pay).
    # 8192 is the scale point; 65k envs deploy across 4+ chips via the
    # sharded path (dryrun_multichip runs this scene on an 8-way mesh).
    # (named manip_65k through r4; renamed — the row now self-describes
    # its nenv in the headline's "nenv" map.)
    "manip_8k": lambda: bench_manip(nenv=8192, nsteps=100, reps=3),
}
_ALL = list(_SCEN_FNS)


def _load_cache():
    try:
        with open(_CACHE) as f:
            c = json.load(f)
        # r3 cache format was a flat headline dict; discard it
        return c if all(isinstance(v, dict) for v in c.values()) else {}
    except (OSError, ValueError):
        return {}


def _save_scenario(res, name=None):
    """Cache a scenario result keyed by the SUBPROCESS scenario name, not
    the inner function's self-label — bench_manip(nenv=8192) runs under the
    name "manip_8k" and must not clobber the "manip" entry (this exact
    clobber corrupted BENCH_r04's headline; VERDICT r4 weak #1)."""
    cache = _load_cache()
    key = name or res["scenario"]
    cache[key] = dict(res, scenario=key, at=time.time())
    tmp = _CACHE + ".tmp"
    try:
        with open(tmp, "w") as f:
            json.dump(cache, f)
        os.replace(tmp, _CACHE)
    except OSError:
        pass


def _headline(cache, fresh):
    """Assemble the single driver-parsed JSON line from per-scenario
    results; scenarios not measured this run fall back to the cache and
    are named in `stale`."""
    stale = [n for n in _ALL if n not in fresh and n in cache]
    missing = [n for n in _ALL if n not in cache]
    box = cache.get("box", {})
    line = {
        "metric": "env_steps_per_sec_per_chip",
        "value": round(box.get("rate", 0.0), 1),
        "unit": "env-steps/s",
        "vs_baseline": round(box.get("rate", 0.0) / 1_000_000.0, 4),
    }
    for name in _ALL[1:]:
        r = cache.get(name)
        if r:
            line[name] = round(r["rate"], 1)
    # self-describing env counts + roofline fractions per scenario
    nenvs, mfu, hbm = {}, {}, {}
    for name in _ALL:
        r = cache.get(name)
        if not r:
            continue
        nenvs[name] = r.get("nenv")
        roof = r.get("roofline") or {}
        if roof:
            mfu[name] = round(roof["mfu"], 5)
            hbm[name] = round(roof["hbm_util"], 4)
    if nenvs:
        line["nenv"] = nenvs
    if mfu:
        line["mfu"] = mfu
        line["hbm_util"] = hbm
    pr2 = cache.get("pr2")
    if pr2:
        # wall ms per batched step at the benched env count (device step
        # is lower: tunnel RTT amortizes over the rollout but not to 0;
        # benchmarks/profile_step.py pr2 gives the device-only number)
        line["pr2_ms_wall"] = round(1000.0 * pr2["nenv"] / pr2["rate"], 3)
    if stale:
        line["stale"] = stale
    if missing:
        line["missing"] = missing
    return line


def _run_measured(name):
    res = _SCEN_FNS[name]()
    _save_scenario(res, name=name)
    roof = res.get("roofline") or {}
    extra = ""
    if roof:
        extra = (f" mfu={roof['mfu']:.4f} hbm_util={roof['hbm_util']:.3f}"
                 f" bytes/step={roof['bytes_per_step']:.3e}")
    print(f"# {name}: nenv={res['nenv']} {res['rate']:.0f} env-steps/s"
          + extra, file=sys.stderr, flush=True)


def main():
    """Per-scenario watchdogged subprocesses: the tunneled chip
    occasionally wedges its COMPILE path (jit hangs indefinitely while
    tiny cached ops still work — observed r3 for multi-hour windows), and
    one wedged scenario must not blank the rest.  Each subprocess writes
    its result to the cache; the headline line is assembled at the end
    with per-scenario stale fallback."""
    if os.environ.get("BENCH_INNER"):
        _run_measured(os.environ["BENCH_INNER"])
        return
    import subprocess
    scenario = os.environ.get("BENCH_SCENARIO", "all")
    names = _ALL if scenario in ("all", "") else [scenario]
    per_budget = int(os.environ.get("BENCH_SCEN_TIMEOUT_S", "420"))
    deadline = time.time() + int(os.environ.get("BENCH_TIMEOUT_S", "1800"))
    fresh = set()
    for name in names:
        left = deadline - time.time()
        if left <= 10:
            print(f"# overall deadline hit; {name} falls back to cache",
                  file=sys.stderr, flush=True)
            continue
        env = dict(os.environ, BENCH_INNER=name)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                timeout=min(per_budget, left))
            if proc.returncode == 0:
                fresh.add(name)
            else:
                print(f"# {name} exited rc={proc.returncode}",
                      file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            print(f"# {name} timed out; using cached value",
                  file=sys.stderr, flush=True)
    print(json.dumps(_headline(_load_cache(), fresh)), flush=True)


if __name__ == "__main__":
    main()
