"""bench.py contract: exactly ONE JSON line on stdout, no matter what.

The driver runs bench.py once per round and records the line; a
transport outage or a driver-side timeout must degrade to an honest
zero line, never to silence or a traceback on stdout (bench.py's
bounded-init + signal paths). These tests drive the failure paths in
subprocesses — the happy path is exercised on hardware by the driver.
"""
import json
import os
import signal
import subprocess
import sys
import time

import pytest

BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")

# Keep children away from the axon TPU tunnel (conftest only fixes the
# parent process; these tests spawn fresh interpreters). The bogus
# platform makes every backend init fail FAST and deterministically.
DOWN_ENV = {**os.environ, "PALLAS_AXON_POOL_IPS": "",
            "JAX_PLATFORMS": "bogus-platform"}


def _one_json_zero_line(stdout: str):
    lines = [ln for ln in stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected exactly one stdout line: {lines!r}"
    rec = json.loads(lines[0])
    assert rec["unit"] == "GS/s"
    assert rec["value"] == 0.0
    assert rec["vs_baseline"] == 0.0
    return rec


def test_bench_emits_zero_line_when_backend_never_recovers():
    # Retry budget 0 → no recovery probe can succeed → honest zero.
    # Malformed RPF_BACKEND_TIMEOUT must be tolerated, not crash.
    r = subprocess.run(
        [sys.executable, BENCH], capture_output=True, text=True,
        timeout=180, env={**DOWN_ENV, "RPF_BENCH_RETRY_BUDGET": "0",
                          "RPF_BACKEND_TIMEOUT": "not-a-number"})
    assert r.returncode == 0, r.stderr
    _one_json_zero_line(r.stdout)
    assert "retry budget" in r.stderr
    assert "ignoring malformed RPF_BACKEND_TIMEOUT" in r.stderr


def test_bench_reexec_marker_short_circuits_the_retry_loop():
    # After a re-exec the marker forbids a second retry loop (a flapping
    # transport must not bounce the bench forever).
    r = subprocess.run(
        [sys.executable, BENCH], capture_output=True, text=True,
        timeout=180, env={**DOWN_ENV, "RPF_BENCH_RETRY_BUDGET": "600",
                          "RPF_BACKEND_TIMEOUT": "60",
                          "RPF_BENCH_REEXEC": "1"})
    assert r.returncode == 0, r.stderr
    _one_json_zero_line(r.stdout)
    assert "backend probe" not in r.stderr  # no retry loop ran


def test_bench_sigterm_still_emits_the_json_line():
    # The unavailable platform makes the in-process init fail fast, so
    # bench sits in its subprocess retry loop; the driver's timeout
    # (SIGTERM) must still produce the one JSON line.
    p = subprocess.Popen(
        [sys.executable, BENCH], stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True,
        env={**DOWN_ENV, "RPF_BENCH_RETRY_BUDGET": "600",
             "RPF_BACKEND_TIMEOUT": "30"})
    try:
        deadline = time.time() + 90
        # Give bench time to install its handlers (module imports run
        # before main()), then deliver the signal; repeat in case the
        # first lands in an uninterruptible spot.
        time.sleep(5.0)
        while time.time() < deadline:
            if p.poll() is not None:
                break
            p.send_signal(signal.SIGTERM)
            try:
                p.wait(timeout=10)
                break
            except subprocess.TimeoutExpired:
                continue
        out, err = p.communicate(timeout=30)
    finally:
        if p.poll() is None:
            p.kill()
            p.communicate()
    assert p.returncode == 0, (p.returncode, err)
    _one_json_zero_line(out)
    assert "terminated by signal" in err
