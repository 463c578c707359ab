"""REAL two-process `all_sum` integration (VERDICT.md r2 next #7).

Spawns two OS processes that `jax.distributed.initialize` against a
local coordinator on the CPU backend and asserts `all_sum` returns the
cross-process sum — the multi-process contract exercised for real, not
just via the mocked single-process test (tests/test_pipeline.py).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

_WORKER = r"""
import json, os, sys
import jax
# Make the env var authoritative over the image's sitecustomize.
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "@REPO@")
from tokenizer_tpu.parallel import multihost

pid = int(sys.argv[1])
multihost.initialize(
    coordinator_address=sys.argv[2], num_processes=2, process_id=pid
)
idx, count = multihost.process_info()
assert count == 2 and idx == pid, (idx, count, pid)
# Each process contributes a DIFFERENT counter vector.
out = multihost.all_sum([10.0 * (pid + 1), 3.0 + pid])
print("RESULT " + json.dumps({"pid": pid, "sum": list(map(float, out))}))
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_all_sum(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # One virtual device per process keeps init fast and unambiguous.
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    worker = _WORKER.replace("@REPO@", str(REPO))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", worker, str(pid), coord],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
            cwd=str(REPO),
        )
        for pid in (0, 1)
    ]
    results = {}
    try:
        for p in procs:
            out, err = p.communicate(timeout=150)
            assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
            for line in out.splitlines():
                if line.startswith("RESULT "):
                    rec = json.loads(line[len("RESULT ") :])
                    results[rec["pid"]] = rec["sum"]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    # 10*(0+1)+10*(1+1)=30 ; (3+0)+(3+1)=7 — identical on both ranks.
    assert results == {0: [30.0, 7.0], 1: [30.0, 7.0]}
