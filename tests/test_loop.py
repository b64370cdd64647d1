"""SimLoop pacing/RTF governor + profiler coverage."""

import time

import numpy as np

from mujoco_sim_tpu import engine
from mujoco_sim_tpu.models.compile import load_model
from mujoco_sim_tpu.runtime.loop import SimLoop
from mujoco_sim_tpu.runtime.profiler import Profiler, stage_timings


def test_simloop_realtime_pacing():
    m = load_model("tests/fixtures/floor_ball.xml")
    d = engine.make_data(m)
    # warm the jit cache so pacing isn't dominated by compile catch-up
    SimLoop(m, d, real_time=False).run(sim_seconds=0.02)
    loop = SimLoop(m, d, real_time=True)
    t0 = time.perf_counter()
    loop.run(sim_seconds=0.25)
    wall = time.perf_counter() - t0
    # paced to wall clock: took at least the simulated duration
    assert wall >= 0.24, wall
    assert 0.5 < loop.rtf <= 1.5, loop.rtf
    assert float(loop.d.time) >= 0.25


def test_simloop_throughput_mode_runs_free():
    m = load_model("tests/fixtures/floor_ball.xml")
    d = engine.make_data(m)
    loop = SimLoop(m, d, real_time=False)
    loop.run(sim_seconds=0.5)
    assert float(loop.d.time) >= 0.5
    assert np.isfinite(np.asarray(loop.d.qpos)).all()


def test_adaptive_timestep_governor():
    """A slow controller forces the loop behind; dt doubles then recovers."""
    m = load_model("tests/fixtures/floor_ball.xml")
    d = engine.make_data(m)

    calls = {"n": 0}

    def slow_controller(m_, d_):
        calls["n"] += 1
        if calls["n"] < 30:
            time.sleep(0.02)  # 4x slower than the 5ms timestep
        return d_

    loop = SimLoop(m, d, max_time_step=0.02, real_time=True,
                   controller=slow_controller)
    loop.run(sim_seconds=0.3)
    # governor engaged at some point (dt grew beyond nominal)...
    assert loop.current_dt >= loop.nominal_dt
    # ...and the sim still completed with finite state
    assert np.isfinite(np.asarray(loop.d.qpos)).all()


def test_profiler_report():
    m = load_model("tests/fixtures/floor_ball.xml")
    d = engine.make_data(m)
    prof = Profiler()
    import jax
    step = jax.jit(engine.step)
    with prof.step_block(n=10, dt=float(m.opt.timestep)):
        for _ in range(10):
            d = step(m, d)
        jax.block_until_ready(d.qpos)
    rep = prof.report()
    assert rep["steps"] == 10
    assert rep["steps_per_sec"] > 0

    timings = stage_timings(m, d, repeats=2)
    assert timings["full_step"] > 0
    assert np.isfinite(timings["fwd_position"])
