"""Benchmark: averaged-spectra throughput on one chip at 2048 bins.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: sustained equivalent IQ throughput in GS/s of the fused
dequant → window → batched FFT → |X|² → masked-reduce step at N=2048
(BASELINE.json north star: 1 GS/s ≈ 488k averaged 2048-bin spectra/s per
chip; ``vs_baseline`` is the fraction of that north star).

Methodology (important on remote-attached TPUs): per-dispatch wall timing
is unreliable here — ``block_until_ready`` can return before the device
actually finishes when the chip sits behind a transport tunnel. So the
step is iterated INSIDE one compiled program (``lax.scan`` with a data
dependency and a per-iteration input perturbation so nothing can be
collapsed), the (tiny) result is fetched to the host — the bytes cannot
arrive before the compute is real — and the per-step time is the slope
between two iteration counts, cancelling fixed dispatch/fetch overhead.
Diagnostics go to stderr; the JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time
from functools import partial

import numpy as np

_METRIC = "equivalent IQ throughput per chip @2048-bin averaged PSD"
_json_emitted = False


def _emit(value: float) -> None:
    """Print the ONE contractual JSON line (at most once per process)."""
    global _json_emitted
    if _json_emitted:
        return
    _json_emitted = True
    print(json.dumps({
        "metric": _METRIC,
        "value": round(float(value), 4), "unit": "GS/s",
        "vs_baseline": round(float(value) / 1.0, 4)}), flush=True)


_probe_child: "subprocess.Popen | None" = None


def _kill_probe_child() -> None:
    p = _probe_child
    if p is not None and p.poll() is None:
        try:
            p.kill()
            p.wait(timeout=5)
        except Exception:  # pragma: no cover - best-effort teardown
            pass


def _emit_zero_and_exit(signum, frame):  # pragma: no cover - signal path
    # If the caller times this bench out (SIGTERM/SIGINT), still honor
    # the one-JSON-line contract with an honest zero instead of dying
    # silently mid-measurement. Any in-flight probe subprocess is killed
    # first — an orphan would otherwise linger against (or later grab)
    # the single-client accelerator.
    print(f"bench: terminated by signal {signum}", file=sys.stderr)
    _kill_probe_child()
    _emit(0.0)
    os._exit(0)


def _env_float(name: str, default: float) -> float:
    """Parse a float env var; malformed values fall back to the default
    (the one-JSON-line contract must survive a bad environment)."""
    try:
        return float(os.environ.get(name, default))
    except (TypeError, ValueError):
        print(f"bench: ignoring malformed {name}={os.environ.get(name)!r}",
              file=sys.stderr)
        return default


def _backend_recovers(budget_s: float, probe_timeout_s: float) -> bool:
    """Probe the accelerator transport in FRESH subprocesses until one
    succeeds or the budget runs out.

    Only called after the in-process bounded init failed: a hung
    ``jax.devices()`` wedges that process's backend init for good (the
    abandoned probe thread holds the once-only init), so recovery after
    a transient transport outage can only be detected from a clean
    process. Returns True as soon as a subprocess sees the device; the
    caller then re-execs itself so a fresh process does the real init."""
    global _probe_child
    deadline = time.monotonic() + budget_s
    per_try = max(probe_timeout_s, 30.0)
    attempt = 0
    while time.monotonic() < deadline:
        attempt += 1
        left = deadline - time.monotonic()
        p = subprocess.Popen(
            [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        _probe_child = p
        try:
            rc = p.wait(timeout=min(per_try, max(left, 30.0)))
            if rc == 0:
                print(f"bench: backend probe ok on attempt {attempt}",
                      file=sys.stderr)
                return True
            print(f"bench: backend probe attempt {attempt} failed "
                  f"(rc={rc})", file=sys.stderr)
        except subprocess.TimeoutExpired:
            _kill_probe_child()
            print(f"bench: backend probe attempt {attempt} hung",
                  file=sys.stderr)
        finally:
            _probe_child = None
        time.sleep(min(60.0, max(0.0, deadline - time.monotonic())))
    return False


def main() -> None:
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _emit_zero_and_exit)
        except (ValueError, OSError):  # non-main thread / exotic host
            pass

    N = 2048
    F = 4096          # frames per step (16.8 MB of u8 IQ)
    ITER_LO, ITER_HI = 32, 128

    # Bounded backend init: a downed accelerator transport can hang the
    # first jax call forever (observed live). The bench must always emit
    # its ONE JSON line, so a hang/failure degrades to an honest zero —
    # after giving a TRANSIENT outage a bounded chance to clear.
    # RPF_BACKEND_TIMEOUT<=0 keeps _backend_ready's documented meaning
    # (probe disabled: proceed straight to the real init, unbounded).
    probe_timeout = _env_float("RPF_BACKEND_TIMEOUT", 240.0)
    retry_budget = _env_float("RPF_BENCH_RETRY_BUDGET", 600.0)

    from rtl_power_fftw_tpu.session import _backend_ready
    from rtl_power_fftw_tpu.exceptions import RPFexception
    try:
        # Healthy path: ONE bounded in-process init, no extra subprocess.
        _backend_ready(timeout=probe_timeout)
    except RPFexception as e:
        print(f"bench: {e}", file=sys.stderr)
        if os.environ.get("RPF_BENCH_REEXEC"):
            # Already retried once after a recovery probe; don't loop on
            # a flapping transport.
            _emit(0.0)
            return
        if not _backend_recovers(budget_s=retry_budget,
                                 probe_timeout_s=probe_timeout):
            print("bench: accelerator transport down for the whole retry "
                  f"budget ({retry_budget:.0f} s)", file=sys.stderr)
            _emit(0.0)
            return
        # The transport recovered, but THIS process's backend init is
        # wedged (the abandoned probe thread holds jax's once-only
        # init) — replace the process so a clean init can run.
        print("bench: transport recovered; re-executing", file=sys.stderr)
        os.environ["RPF_BENCH_REEXEC"] = "1"
        sys.stderr.flush()
        sys.stdout.flush()
        os.execv(sys.executable,
                 [sys.executable, os.path.abspath(__file__)])

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"bench device: {dev} ({dev.platform})", file=sys.stderr)

    from rtl_power_fftw_tpu.ops.spectral import PsdStep

    # The SHIPPING step: PsdStep's auto path. At N=2048 this is the
    # lane-matched hybrid four-step (batched FFT stage 1 + split twiddle
    # + Precision.HIGHEST matmul stage 2, N2 ~ 128 — tone-robust and the
    # fastest default; the fused Pallas kernel ships the 4096-65536
    # power-of-two band and the large-N hybrid takes 2^17 up).
    step = PsdStep(N, F, backend="auto")
    step_fn = step.lowered_fn()
    nv = jnp.int32(F)

    rng = np.random.default_rng(0)
    raw_host = rng.integers(0, 256, size=(F, 2 * N), dtype=np.uint8)
    raw = jax.device_put(
        raw_host.view(np.uint16) if step.takes_u16 else raw_host, dev)
    perturb_dtype = jnp.uint16 if step.takes_u16 else jnp.uint8
    print(f"auto path: {'u16-view fused step (hybrid/pallas/fft4)' if step.takes_u16 else 'four-step matmul'}",
          file=sys.stderr)

    @partial(jax.jit, static_argnums=1)
    def many_steps(raw, iters):
        # The shipping step chained `iters` times with a cheap input
        # perturbation per iteration so nothing can be collapsed.
        def body(carry, i):
            part = step_fn(raw + i.astype(perturb_dtype), nv)
            return carry + part, ()
        acc, _ = jax.lax.scan(body, jnp.zeros(N, jnp.float32),
                              jnp.arange(iters))
        return acc

    def timed(iters: int, reps: int = 3) -> float:
        np.asarray(many_steps(raw, iters))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(many_steps(raw, iters))  # fetch forces completion
            best = min(best, time.perf_counter() - t0)
        return best

    # Contention-robust protocol: 3 isolated rounds; the figure is the
    # slope between the POOLED minima of the two endpoints. The shared
    # terminal occasionally time-slices the chip hard (observed 26×
    # one-off slowdowns) — contention only ever SLOWS a sample, so each
    # endpoint's pooled minimum is its honest value, while min-of-slopes
    # could be fabricated fast by a stall hitting only t(lo).
    t_lo = t_hi = float("inf")
    rounds = 3
    while True:
        for _ in range(rounds):
            t_lo = min(t_lo, timed(ITER_LO))
            t_hi = min(t_hi, timed(ITER_HI))
        if t_hi > t_lo:
            break
        # Every ITER_HI round stalled behind contention: the slope would
        # be <= 0 and the JSON value negative/inf. Keep pooling more
        # rounds (bounded) — minima only improve, so this converges to
        # honest endpoints as soon as one clean round of each lands.
        rounds += 2
        if rounds > 9:
            print("warning: endpoint minima never ordered "
                  f"(t_lo={t_lo:.3f}s t_hi={t_hi:.3f}s); chip contention "
                  "dominated every round", file=sys.stderr)
            break
    if t_hi <= t_lo:
        # Unrecoverable: report an explicit 0 rather than a negative or
        # infinite throughput in the one-JSON-line contract.
        _emit(0.0)
        return
    per_step = (t_hi - t_lo) / (ITER_HI - ITER_LO)
    overhead = t_lo - ITER_LO * per_step
    spectra_per_s = F / per_step
    gsps = spectra_per_s * N / 1e9

    print(f"t[{ITER_LO}]={t_lo*1e3:.1f} ms  t[{ITER_HI}]={t_hi*1e3:.1f} ms  "
          f"fixed overhead ~{overhead*1e3:.1f} ms", file=sys.stderr)
    print(f"per-step {per_step*1e6:.1f} us → {spectra_per_s:,.0f} spectra/s "
          f"= {gsps:.3f} GS/s", file=sys.stderr)

    _emit(gsps)


if __name__ == "__main__":
    main()
