#!/usr/bin/env python3
"""Spawn/destroy demo against a running SimServer.

Equivalent of the reference's ontology demo script spawning a cat via the
spawn service (model/ontology/script/spawn_cat.py) and of the manual test
driver test/test_spawn_and_destroy.py: objects appear on a ring, live for a
window, then are destroyed.

Usage: python examples/spawn_objects_demo.py [host] [port]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from mujoco_sim_tpu.io.client import SimClient  # noqa: E402


def main():
    host = sys.argv[1] if len(sys.argv) > 1 else "127.0.0.1"
    port = int(sys.argv[2]) if len(sys.argv) > 2 else 7500
    c = SimClient(host, port)
    window = []
    for i in range(12):
        ang = 2 * np.pi * (i % 6) / 6
        pose = [0.8 * np.cos(ang), 0.8 * np.sin(ang), 1.0, 1, 0, 0, 0]
        try:
            names = c.spawn_objects([{
                "info": {"name": f"obj_{i}", "type": 1},
                "class": "sball", "pose": pose}])
        except Exception as e:
            print("spawn failed:", e)
            break
        window.extend(names)
        print("spawned", names)
        if len(window) > 3:
            victim = window.pop(0)
            states = c.destroy_objects([victim])
            print("destroyed", victim, "final z=",
                  round(states[0]["pose"][2], 3))
        time.sleep(0.3)
    c.close()


if __name__ == "__main__":
    main()
