"""Blocking JSON-lines client for SimServer (test-driver equivalent of the
reference's rospy service proxies, test/test_spawn_and_destroy.py:58-66)."""

from __future__ import annotations

import json
import socket


class SimClient:
    def __init__(self, host="127.0.0.1", port=7500, timeout=120.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.f = self.sock.makefile("rw")

    def call(self, op: str, **kw) -> dict:
        req = {"op": op, **kw}
        self.f.write(json.dumps(req) + "\n")
        self.f.flush()
        line = self.f.readline()
        if not line:
            raise ConnectionError("server closed")
        return json.loads(line)

    def spawn_objects(self, objects) -> list[str]:
        return self.call("spawn_objects", objects=objects)["names"]

    def destroy_objects(self, names) -> list[dict]:
        return self.call("destroy_objects", names=names)["object_states"]

    def reset(self) -> bool:
        return self.call("reset").get("success", False)

    def screenshot(self, out_dir="/tmp/mst_screenshot", name="snapshot"):
        return self.call("screenshot", out_dir=out_dir, name=name)

    def cmd_vel(self, robot: str, twist):
        return self.call("cmd_vel", robot=robot, twist=list(twist))

    def get_state(self, names=None) -> dict:
        return self.call("get_state", names=names)

    def subscribe(self, topics, rate=60.0):
        """Generator of streamed messages (closes on iterator exit)."""
        req = {"op": "subscribe", "topics": topics, "rate": rate}
        self.f.write(json.dumps(req) + "\n")
        self.f.flush()
        try:
            for line in self.f:
                yield json.loads(line)
        finally:
            self.close()

    def close(self):
        try:
            self.sock.close()
        except OSError:
            pass
