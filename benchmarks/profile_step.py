"""Per-op device-time profile of one bench scenario's step on the real chip.

Usage:  python benchmarks/profile_step.py [box|mobile|pr2|spawn] [nsteps]

Captures a jax.profiler trace of a short rollout and prints total device
time per step plus the top ops (XLA fusion/while/custom-call names), the
fastest way to see what a scenario's step actually spends its time on.
The axon tunnel RTT does not pollute these numbers — they are device-side
durations from the trace, not wall clock.
"""

import collections
import glob
import gzip
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402


def main():
    scenario = sys.argv[1] if len(sys.argv) > 1 else "pr2"
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    import bench

    fn = {"box": bench.bench_box, "mobile": bench.bench_mobile,
          "pr2": bench.bench_pr2, "spawn": bench.bench_spawn,
          "manip": bench.bench_manip}[scenario]

    # monkeypatch the timing helper to run the warmed rollout under a trace
    tdir = os.environ.get("TRACE_DIR", "/tmp/jaxtrace")
    os.system(f"rm -rf {tdir}")

    cost = {}

    def traced(run, m, dB, nenv, nsteps_, reps=3):
        out = run(m, dB)
        jax.block_until_ready(out.qpos)
        with jax.profiler.trace(tdir):
            out = run(m, out)
            jax.block_until_ready(out.qpos)
        c = bench._cost_analysis(run, m, dB)
        if c:
            cost.update(c)
        return 1.0, 1.0, None

    bench._time_rollout = traced
    fn(nsteps=nsteps)

    paths = glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz")
    assert paths, f"no trace under {tdir}"
    with gzip.open(paths[0], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device ops live on the /device:TPU pid; host threads under /host:CPU
    dev_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "/device:" in str(e.get("args", {}).get("name", ""))}
    # containers (the jit program, lax while loops) nest their children's
    # events; report the program total from the outermost event and rank
    # leaf ops only.  NB the trace writer caps around 1e6 events — keep
    # nsteps small enough that the rollout fits or the tail is undercounted.
    dev = [e for e in events
           if e.get("ph") == "X" and e.get("pid") in dev_pids]
    is_cont = lambda n: n.startswith(("jit_", "while"))
    total = max((e["dur"] for e in dev if is_cont(e["name"])), default=0)
    per = collections.Counter()
    for e in dev:
        if not is_cont(e["name"]):
            per[e["name"]] += e.get("dur", 0)
    conts = collections.Counter()
    for e in dev:
        if is_cont(e["name"]):
            conts[e["name"]] += e.get("dur", 0)
    leafsum = sum(per.values())
    nev = len(dev)
    print(f"{scenario}: device {total / 1e3 / nsteps:.3f} ms/step; leaves "
          f"{leafsum / 1e3 / nsteps:.3f} ms/step over {len(per)} distinct "
          f"ops ({nsteps} steps, {nev} events{' TRUNCATED' if nev >= 999_000 else ''})")
    if cost and total > 0:
        # per-step roofline vs v5e peaks from XLA cost analysis (while
        # bodies counted once = per-step; nested Newton while is a lower
        # bound — see bench._cost_analysis)
        step_s = total / 1e6 / nsteps
        print(f"  roofline: {cost['flops'] / 1e9:.3f} GFLOP/step "
              f"({cost['flops'] / step_s / bench._V5E_PEAK_FLOPS * 100:.3f}% MXU), "
              f"{cost['bytes'] / 1e6:.2f} MB/step "
              f"({cost['bytes'] / step_s / bench._V5E_PEAK_HBM * 100:.1f}% HBM)")
    for name, us in conts.most_common(4):
        print(f"  [container] {us / nsteps:8.1f}us/step  {name[:60]}")
    for name, us in per.most_common(int(os.environ.get("TOP", 15))):
        print(f"  {us / nsteps:8.1f}us/step  {name[:70]}")
    if os.environ.get("GROUP"):
        # attribute leaves to their innermost while container by timestamp
        # nesting (each leaf event lies inside its container's [ts, ts+dur))
        spans = sorted(((e["ts"], e["ts"] + e["dur"], e["name"])
                        for e in dev if e["name"].startswith("while")),
                       key=lambda s: s[1] - s[0])
        bycont = collections.defaultdict(collections.Counter)
        nleaf = collections.defaultdict(collections.Counter)
        for e in dev:
            if is_cont(e["name"]):
                continue
            t0 = e["ts"]
            for a, b, nm in spans:
                if a <= t0 < b:
                    bycont[nm][e["name"]] += e.get("dur", 0)
                    nleaf[nm][e["name"]] += 1
                    break
            else:
                bycont["<top>"][e["name"]] += e.get("dur", 0)
                nleaf["<top>"][e["name"]] += 1
        for cont, ctr in sorted(bycont.items(),
                                key=lambda kv: -sum(kv[1].values())):
            tot = sum(ctr.values())
            nops = sum(len(v) for v in [ctr])
            print(f"  == {cont}: {tot / 1e3 / nsteps:.3f} ms/step, "
                  f"{len(ctr)} distinct leaf ops ==")
            for name, us in ctr.most_common(int(os.environ.get("GTOP", 8))):
                print(f"     {us / nsteps:8.1f}us/step x{nleaf[cont][name] // nsteps:4d}  {name[:60]}")


if __name__ == "__main__":
    main()
