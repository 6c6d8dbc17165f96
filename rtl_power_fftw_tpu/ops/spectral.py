"""The spectral core: fused dequant → window → FFT → |X|² accumulation.

TPU-first re-design of the reference's FFT worker (datastore.cxx:48-96).
Instead of one N-point FFT at a time in a mutex-guarded thread, the whole
buffer is processed as ONE jitted device step over a fixed-shape batch of
frames, so XLA fuses the u8 dequantization and window multiply into the
transform and the batch axis keeps the MXU/VPU saturated.

Semantics preserved from the reference:

* dequantization is ``(u8 − 127)`` (datastore.cxx:75);
* the reference multiplies samples by (−1)^n so spectra come out
  pre-shifted (datastore.cxx:69-75).  FFT(x·(−1)^n) = fftshift(FFT(x)) for
  even N, and fftshift commutes with |·|² and accumulation — so we
  accumulate *unshifted* power and apply one fftshift at finalization.
  Bit-for-bit the same result, one whole multiply pass cheaper;
* the window multiplies the dequantized samples (order is irrelevant since
  multiplication commutes) (datastore.cxx:76-77);
* accumulation in the reference is float64 (datastore.h:53).  TPUs have no
  fast f64, so each device step reduces its frames with a two-stage f32
  tree sum (error ≈ √(chunk)·ε instead of F·ε) and the HOST accumulates
  the per-step partial sums in float64.  Relative error stays ≪1e-5 over
  arbitrarily many averaged spectra;
* frames carry across buffer boundaries (datastore.cxx:52,66-80):
  ``FrameSlicer`` keeps the remainder bytes between buffers;
* processing stops at exactly ``repeats`` frames even if more data was
  read (datastore.cxx:67): the caller clamps ``n_valid``.

Finalization (DC-bin interpolation, normalization, dB, baseline) follows
acquisition.cxx:376-399 in float64 on the host.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dft import dft_power_fourstep, dft_power_matmul

# Frames are reduced in chunks of this size before the cross-chunk sum;
# two-stage summation keeps f32 rounding error at ~(CHUNK + F/CHUNK)·ε.
_SUM_CHUNK = 64


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def adapt_batch(frames_per_step: int) -> Tuple[int, int]:
    """Shared frame-batch sizing: (F, chunk) with F rounded to a multiple
    of 8 and chunk the largest power-of-two divisor ≤ _SUM_CHUNK — the
    two-stage-tree-sum invariant every device step relies on."""
    F = _round_up(max(int(frames_per_step), 1), 8)
    chunk = _SUM_CHUNK
    while F % chunk != 0:
        chunk //= 2
    return F, chunk


def dequant_iq(raw: jax.Array, F: int, N: int,
               window: Optional[jax.Array] = None):
    """THE dequantization convention, in one place: interleaved u8 IQ →
    (re, im) float32 planes, ``(u8 − 127)`` per datastore.cxx:75, with an
    optional window multiply. Used by every device step in the framework.

    Implementation: the interleaved (re, im) byte pair is read as ONE
    little-endian u16 lane and split with integer mask/shift — pure
    elementwise VPU work instead of a strided (F, N, 2) gather. Bit-exact
    with the naive formulation and measured ~20% faster end-to-end on a
    v5e (the gather costs a real data-movement pass).
    """
    v = jax.lax.bitcast_convert_type(raw.reshape(F, N, 2), jnp.uint16)
    return dequant_iq_u16(v, window)


def dequant_iq_u16(raw16: jax.Array,
                   window: Optional[jax.Array] = None):
    """``dequant_iq`` for inputs already holding the u16 lane view (the
    free HOST-side reinterpretation of the interleaved u8 pairs — every
    fused path takes it to skip the on-device bitcast relayout). Same
    convention, single-sourced: low byte = re, high byte = im, −127.
    """
    v = raw16.astype(jnp.int32)
    re = ((v & 0xFF) - 127).astype(jnp.float32)
    im = ((v >> 8) - 127).astype(jnp.float32)
    if window is not None:
        re = re * window
        im = im * window
    return re, im


def pad_frames(batch: np.ndarray, F: int) -> np.ndarray:
    """Zero-pad a (n, 2N) frame batch up to the step's fixed (F, 2N)."""
    n = len(batch)
    if n >= F:
        return batch
    return np.concatenate(
        [batch, np.zeros((F - n, batch.shape[1]), np.uint8)])


def _power_backend(backend: str, N: int) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Return fn(re, im) -> |FFT|² for (F, N) float32 inputs."""
    if backend == "matmul":
        return dft_power_matmul
    if backend == "fourstep":
        return dft_power_fourstep
    if backend == "bluestein":
        # Per-frame chirp-Z power — estimator steps that need (F, N)
        # spectra (the SK family) at awkward N where the monolithic
        # platform FFT is slow/compile-refused. (The PSD steps never
        # consume this: their bluestein rung is the fused partial.)
        from .dft import dft_power_bluestein
        return dft_power_bluestein
    if backend in ("xla", "auto", "pallas", "fft4", "hybrid",
                   "fourstep4m", "fourstep4x"):
        # "pallas"/"fft4" route power computation to their fused paths at
        # the PsdStep level; the plain backends (and the fallbacks for
        # ineligible shapes, e.g. prime N) land here.
        def xla_fft_power(re, im):
            x = jax.lax.complex(re, im)
            X = jnp.fft.fft(x, axis=-1)
            return jnp.real(X) * jnp.real(X) + jnp.imag(X) * jnp.imag(X)
        return xla_fft_power
    raise ValueError(f"unknown fft backend: {backend}")


def is_fft_compile_refusal(e: Exception) -> bool:
    """True when an exception looks like the backend REFUSING TO LOWER a
    program (compile-time UNIMPLEMENTED/unsupported), as opposed to a
    runtime/user error. Shared by the PsdStep and ShardedPsdStep
    monolithic-FFT fallbacks so the two classifiers cannot diverge."""
    msg = f"{type(e).__name__}: {e}"
    return any(s in msg for s in ("UNIMPLEMENTED", "Unimplemented",
                                  "NotImplemented", "unsupported",
                                  "Unsupported"))


# The matmul-DFT fallback materializes 2·(N, N) f32 weight tables; cap the
# rebuild at 0.5 GiB of weights (N = 8192) — prime/2·prime bin counts in
# practice are far smaller.
FFT_FALLBACK_MAX_N = 8192


def warn_fft_compile_fallback(N: int, e: Exception, what: str,
                              suffix: str = "") -> bool:
    """The shared guard for every step's last-resort monolithic-FFT
    compile fallback: True iff ``e`` is a backend compile REFUSAL (not a
    runtime/user error) at a size the matmul-DFT rebuild can absorb, in
    which case the standard warning naming ``what`` is printed and the
    caller rebuilds its step on the matmul DFT and retries. Callers gate
    on their own mode bookkeeping first (only the "xla" mode touches the
    monolithic lowering); keeping the refusal classifier, the size cap,
    and the message in ONE place keeps the eight fallback sites from
    diverging.

    Backend caveat (measured 2026-08-18 on the remote-attached v5e): on
    that toolchain a refused FFT compile POISONS the whole jax client —
    every subsequent dispatch in the process, including the rebuilt
    matmul step, fails with the same UNIMPLEMENTED — so there the retry
    cannot save the session and it exits with the typed HardwareError
    (7). The fallback still holds on backends whose refusals are clean
    (the CPU-pinned tests model those). Envelope history on the
    measured toolchain: 2026-08-18 refusals covered LONG monolithic
    complex FFTs (2^16..2^20) while N=998/1042 compiled live;
    2026-08-19 the SAME bare monolithic shape refused at EVERY probed
    size (122, 998, 2048, 8192) while the framework's batched
    short-stage formulations (hybrid/fft4/bluestein stages, verified
    live) kept compiling — which is why the xla rung now pre-flights
    out-of-process BY DEFAULT on TPU (resolve_xla_rung) and this
    in-process fallback is the second line of defense."""
    if N > FFT_FALLBACK_MAX_N or not is_fft_compile_refusal(e):
        return False
    import sys
    print(f"Warning: the platform FFT failed to compile for N={N} "
          f"({type(e).__name__}); {what} falls back to the matmul DFT "
          f"path{suffix}.", file=sys.stderr)
    return True


#: in-process cache of child-process platform-FFT compile probes
_PREFLIGHT_CACHE: dict = {}


def _preflight_fingerprint() -> str:
    """Toolchain fingerprint keying the ON-DISK preflight cache: a
    probe's verdict is a property of (jax, jaxlib, backend runtime
    build, length N), not of the process — every sibling process on the
    same build may reuse it. The backend platform_version carries the
    libtpu/runtime build where the backend exposes one."""
    import hashlib
    try:
        import jaxlib
        jl = getattr(jaxlib, "__version__", "?")
    except Exception:
        jl = "?"
    try:
        pv = str(getattr(jax.devices()[0].client, "platform_version", "?"))
    except Exception:
        pv = "?"
    raw = f"{jax.__version__}|{jl}|{jax.default_backend()}|{pv}"
    return hashlib.sha1(raw.encode()).hexdigest()[:16]


def _preflight_disk_path() -> str:
    import os
    base = os.environ.get("RPF_FFT_PREFLIGHT_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "rtl_power_fftw_tpu")
    return os.path.join(base, "preflight.json")


def _preflight_disk_load() -> dict:
    """{N(str): bool} for the current toolchain fingerprint ({} when
    the cache is absent, unreadable, or disabled)."""
    import json
    import os
    if os.environ.get("RPF_FFT_PREFLIGHT_CACHE", "") == "0":
        return {}
    try:
        with open(_preflight_disk_path()) as f:
            return json.load(f).get(_preflight_fingerprint(), {})
    except Exception:
        return {}


def _preflight_disk_store(N: int, ok: bool) -> None:
    """Merge one DEFINITIVE probe verdict into the on-disk cache
    (atomic tmp+rename so concurrent sessions cannot torn-write; a
    losing concurrent writer only costs the next process one re-probe).
    Best-effort: an unwritable cache dir must never fail a session."""
    import json
    import os
    if os.environ.get("RPF_FFT_PREFLIGHT_CACHE", "") == "0":
        return
    path = _preflight_disk_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            with open(path) as f:
                data = json.load(f)
        except Exception:
            data = {}
        if not isinstance(data, dict):
            data = {}
        fp = _preflight_fingerprint()
        data.setdefault(fp, {})[str(N)] = bool(ok)
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            json.dump(data, f)
        os.replace(tmp, path)
    except Exception:
        pass


def platform_fft_preflight_ok(N: int) -> bool:
    """Compile-probe the platform's monolithic complex FFT at length N
    in a CHILD process and report whether it lowered.

    Rationale (measured 2026-08-18 on the remote-attached v5e, recorded
    in warn_fft_compile_fallback): on that toolchain a refused FFT
    compile POISONS the whole jax client — the in-process matmul
    fallback can then never succeed, and a session that commits to the
    xla rung dies with the typed HardwareError. Probing out-of-process
    keeps the session's client clean, so it can pre-emptively select a
    rung that always lowers (matmul below the weight cap, chirp-Z
    above). The reference never aborts on a plannable size
    (datastore.cxx:30-33) — neither should a session here.

    ``RPF_FFT_PREFLIGHT_FORCE=ok|fail`` bypasses the subprocess (test
    hook / operator override). Results are cached per N for the
    process lifetime; a probe that CRASHES or hangs (>
    ``RPF_FFT_PREFLIGHT_TIMEOUT`` seconds, default 300 — compiles take
    20-150 s and a wedged transport should not stall session startup
    for longer) counts as a refusal — degrading to a slower rung is
    recoverable, a poisoned session is not. Child failures whose
    stderr does NOT carry a compile-refusal signature (device
    contention on single-client runtimes, a flaky tunnel, transient
    transport errors) are retried ONCE before a refusal is cached, so
    one unlucky probe cannot permanently downgrade a healthy session
    (round-4 advisor finding).

    DEFINITIVE verdicts (compiled ok, or a genuine refusal signature)
    are additionally persisted ON DISK keyed by the toolchain
    fingerprint (see _preflight_fingerprint) under
    ``~/.cache/rtl_power_fftw_tpu/preflight.json`` —
    ``RPF_FFT_PREFLIGHT_CACHE_DIR`` overrides the directory,
    ``RPF_FFT_PREFLIGHT_CACHE=0`` disables persistence — so a cold
    awkward-N session on a probed toolchain skips the 20-150 s child
    compile every sibling process used to re-pay (round-5 ask #4).
    Transient double-failures are cached in-process only: one wedged
    tunnel must not downgrade the fleet.
    """
    import os
    import subprocess
    import sys
    force = os.environ.get("RPF_FFT_PREFLIGHT_FORCE", "")
    if force == "ok":
        return True
    if force == "fail":
        return False
    if N in _PREFLIGHT_CACHE:
        return _PREFLIGHT_CACHE[N]
    disk = _preflight_disk_load()
    if str(N) in disk:
        ok = bool(disk[str(N)])
        _PREFLIGHT_CACHE[N] = ok
        return ok
    code = ("import numpy as np, jax, jax.numpy as jnp\n"
            f"z = np.zeros((2, {N}), np.complex64)\n"
            "out = jax.jit(lambda z: jnp.abs(jnp.fft.fft(z, axis=1)))(z)\n"
            "np.asarray(out)\n")
    try:
        tmo = float(os.environ.get("RPF_FFT_PREFLIGHT_TIMEOUT", "300"))
    except ValueError:
        tmo = 300.0

    def probe():
        """(ok, is_refusal): ok iff the child compiled+ran; is_refusal
        iff its stderr carries a compile-refusal signature (the same
        classifier the in-process fallback uses) — anything else
        (crash, timeout, transport error) is treated as transient."""
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, timeout=tmo)
        except Exception:
            return False, False  # hang/timeout: transient by default
        if r.returncode == 0:
            return True, False
        err = (r.stderr or b"").decode("utf-8", "replace")
        refused = any(s in err for s in ("UNIMPLEMENTED", "Unimplemented",
                                         "NotImplemented", "unsupported",
                                         "Unsupported"))
        return False, refused

    ok, refused = probe()
    if not ok and not refused:
        ok, refused = probe()  # transient failure: one retry
    _PREFLIGHT_CACHE[N] = ok
    if ok or refused:
        _preflight_disk_store(N, ok)  # definitive → share fleet-wide
    return ok


def resolve_xla_rung(N: int, tpu: bool, what: str) -> str:
    """Final path decision for a selected "xla" rung, shared by PsdStep
    and ShardedPsdStep: pre-flight the monolithic-FFT compile in a child
    process when the size is refusal-prone, and pre-emptively downgrade
    to a rung that always lowers ("matmul" within its weight cap,
    "bluestein" above) if the platform refuses — BEFORE the session's
    own client ever touches the lowering (which would poison it on the
    measured toolchain; see platform_fft_preflight_ok).

    Gate: TPU and N >= RPF_FFT_PREFLIGHT_MIN (default 0 — i.e. EVERY
    TPU xla-rung selection pre-flights. Round 3 observed refusals only
    at 2^16..2^20 and the gate defaulted to 16384; on 2026-08-19 the
    same toolchain refused the bare monolithic complex FFT at EVERY
    probed size — 122, 998, 2048, 8192 — while the framework's batched
    short-stage formulations kept compiling, so the rung now defaults
    to proving the lowering out-of-process before committing. Healthy
    toolchains pay one cached child compile per awkward-N session).
    ``RPF_FFT_PREFLIGHT=1`` forces the pre-flight on any platform,
    ``=0`` disables it.
    """
    import os
    import sys
    mode = os.environ.get("RPF_FFT_PREFLIGHT", "")
    if mode == "0":
        return "xla"
    if mode != "1":
        try:
            min_n = int(os.environ.get("RPF_FFT_PREFLIGHT_MIN", "0"))
        except ValueError:
            min_n = 0  # garbage env must not kill a session
        if not (tpu and N >= min_n):
            return "xla"
    if platform_fft_preflight_ok(N):
        return "xla"
    new = "matmul" if N <= FFT_FALLBACK_MAX_N else "bluestein"
    print(f"Warning: the platform FFT failed the out-of-process compile "
          f"pre-flight for N={N}; {what} pre-emptively selects the "
          f"{new} path (a refused compile would poison the session's "
          "device client).", file=sys.stderr)
    return new


def select_transform_rung(N: int, F: int, windowed: bool, backend: str,
                          tpu: bool):
    """The auto-ladder band selection — ONE definition shared by PsdStep
    and ShardedPsdStep (the selection diverged once when it lived in two
    copies). Returns ``(path, split)`` with path in {"pallas", "hybrid",
    "fourstep", "fourstep4m", "fourstep4x", "fft4", "bluestein", "xla",
    "matmul"} and
    split the
    (n1, n2) factorization for the four-step family (None otherwise).
    Raises ValueError for explicit requests that cannot be satisfied.

    Measured bands (probes/, BENCHMARKS.md; v5e unless noted):

    * pallas — the fused VMEM kernel, UNWINDOWED power-of-two
      4096–65536 on real TPUs (N=4096 13.4 GS/s vs four-step 9.4;
      N=8192 13.8 vs 8.3; N=65536 10.5 vs 7.0; below 4096 the stage-1
      matmuls are too narrow, and at 2^17 the large-N hybrid matches
      its speed at ~3× better tone accuracy). The kernel left the
      WINDOWED auto ladder in round 5: its windowed cells fail the
      strict-yard median (1.90×/1.55× at 8192/16384, 60 seeds —
      probes/windowed_tail_audit.py) where fourstep4x passes with
      margin; it remains the windowed --precision high relaxed tier
      and explicit backend (12.5–13.0 GS/s at those shapes).
    * hybrid — FFT stage 1 + split twiddle + HIGHEST-matmul stage 2,
      lane-matched split (N2 ≈ 128, stage-1 length ≥ 8). Unwindowed
      512–3072 everywhere (fastest at ≤1.3× the FFTW-f32 class error)
      and TPU composite N > 2^19 (beats the reference's own f32 class
      at ~2× fft4's throughput at 2^20, probes/hybrid_large.py; the
      round-4 tail audit retreated it from unwindowed (8192, 2^18) —
      distribution maxima up to 9.36× class there,
      probes/unwindowed_2e17_tail.py). Windowed it
      loses its accuracy class up through 2^18 (the time-domain
      multiply takes stage 1 off its exact integer inputs — windowed
      medians 2.4–6.4× class, probes/windowed_fold.py and
      probes/windowed_band_decide.py; the round-4 attribution proved
      the excess is 100% stage-1-INTERNAL: neither a split window, a
      bf16-boundary input split, nor f64-finishing everything after
      stage 1 moves it — probes/windowed_attrib.py) so windowed
      auto admits it only above 524288, where the class error itself
      has grown past the hybrid's excess (2^20: median 1.16× class at
      15.6 GS/s; 2^19 belongs to the compensated four-step below).
      On CPU the lane-matched K=128 split doubles
      the BLAS accumulation tail, so CPU auto uses the near-square
      split and only 512–3072 unwindowed.
    * fourstep — the transpose-free all-matmul partial: composite
      N < 512 everywhere, the TPU 3072 < N ≤ 8192 band (12.5–15.5 GS/s
      at a 1.58×-class tail vs the hybrid's 2.7×), and WINDOWED TPU
      512–262144 wherever the kernel doesn't take it (the matmul
      stages are indifferent to non-integer inputs; at windowed
      2^17/2^18 it is the fastest budget-passing candidate —
      1.50×/1.29× median class vs the hybrid's 2.90×/2.42×,
      probes/windowed_band_decide.py and probes/windowed_comp.py).
    * fourstep4x — the SPLIT-PASS four-step: the fourstep4m tail under
      an explicit native-bf16 stage 1 (4-term input × 4-term weight
      truncation splits, triangular 10-pass set, contraction depth
      held ≤ 16) whose products are ALL exact — the windowed TPU
      session band 1024–16384 (N divisible by 8), where the stage-1
      HIGHEST emulation's dropped cross products on non-integer input
      put every other candidate above the 1.5× strict-yard median
      (round-5 stage-1 attribution + fix, probes/windowed_s1x.py,
      BENCHMARKS "Windowed session-size stage-1 fix").
    * fourstep4m — the COMPENSATED four-step (4-mult stages, hi+lo
      split twiddle, chunked stage-2 tree accumulation): windowed TPU
      (262144, 524288] — the band where the plain fourstep fails the
      1.5× median (1.94×) and the hybrid is stage-1-bound (1.88×);
      measured p50 0.91× / max 0.71× class at 2.18 GS/s (better than
      the FFTW class itself — probes/windowed_comp.py), closing the
      round-3 budget exception — AND unwindowed TPU (8192, 2^18)
      non-pallas, where the round-4 tail audit found the hybrid's
      per-seed tails pool-unstable (breaches at 49152 and 2^17);
      from 2^18 up the hybrid's tail thins monotonically and takes
      over. fourstep4m is the only candidate passing every audited
      size in its bands (max ≤1.21×, per-seed p99 ≤2.6× —
      probes/unwindowed_2e17_tail.py).
    * fft4 — the two-level FFT four-step for the remaining very-large
      composite N (the monolithic XLA FFT lowers poorly there,
      probes/fftfourstep_sweep.py); non-TPU auto keeps it above 8192.
    * bluestein — the chirp-Z rung (one pow-2 circular convolution on
      the framework's batched-short-FFT stages): TPU N > 8192 with no
      factor >= 8 (the 2·prime class), where matmul is over its weight
      cap, the four-step family declines, and the monolithic platform
      FFT is slow at best and compile-refused at 2^16..2^20 on the
      current toolchain. FFTW-class accuracy (~1e-6..3e-6 measured).
    * xla — the platform FFT: prime/degenerate N <= 8192 on TPU
      (pre-flighted out-of-process by default — the 2026-08-19
      toolchain refuses the bare monolithic lowering at EVERY probed
      size, so this rung degrades to matmul there), and all CPU
      windowed sizes above the matmul band (CPU XLA FFT IS the FFTW
      class).
    """
    if backend == "matmul":
        return "matmul", None
    if backend in ("pallas", "auto"):
        from .kernels.fused_psd import fused_psd_available
        eligible = fused_psd_available(N, F, windowed=windowed)
        if backend == "pallas":
            if not eligible:
                raise ValueError(
                    f"pallas backend unavailable for N={N}, F={F} (needs "
                    "a power of two >= 256 whose working set fits VMEM); "
                    "use backend='auto'")
            return "pallas", None
        # The kernel's AUTO band is unwindowed-only since round 5: its
        # windowed cells (pow-2 8192/16384) fail the strict-yard median
        # (1.90x/1.55x at 60 seeds, round-4 audit) while the split-pass
        # four-step passes with margin (0.68x/0.73x screens; 60-seed
        # audit in BENCHMARKS "Windowed session-size stage-1 fix") —
        # budget-first, the kernel stays available windowed as the
        # explicit backend and as the relaxed tier (--precision high).
        if eligible and 4096 <= N <= 65536 and tpu and not windowed:
            return "pallas", None
    windowed_cpu = windowed and not tpu
    if backend in ("fourstep4x", "auto"):
        from .dft import best_fourstep4x_split
        n1x, n2x = best_fourstep4x_split(N)
        if backend == "fourstep4x":
            if n1x not in (8, 16, 32):
                raise ValueError(
                    f"backend='fourstep4x' needs N divisible by 8 "
                    f"(N={N}); use backend='auto'")
            return "fourstep4x", (n1x, n2x)
        # The SPLIT-PASS four-step: windowed TPU session sizes
        # 1024-16384 where N has a viable shallow stage-1 split. The
        # round-4 "measured hardware floor" (med 2.0-2.4x the strict
        # scipy-only class at windowed 1024-8192, 1.55-1.70x at 16384)
        # was REFUTED at stage 1 itself in round 5: with the stage-1
        # HIGHEST matmul replaced by the explicit all-exact-products
        # split-pass scheme and the contraction depth held <= 16 (K=16
        # direct or K=32 via a chunk-16 tree), the strict-yard medians
        # read 0.84-1.46x across 1024-4096 (24-seed screens, 60-seed
        # admission audit in BENCHMARKS "Windowed session-size stage-1
        # fix"; probes/windowed_s1x.py runs 1-6). Below 1024 the
        # compensated four-step already passes outright (0.89x at 512)
        # and is ~3x faster; above 16384 fourstep4m/fourstep pass
        # strict at full speed.
        if tpu and windowed and n1x in (8, 16, 32) and 1024 <= N <= 16384:
            return "fourstep4x", (n1x, n2x)
    if backend in ("fourstep4m", "auto"):
        from .dft import best_fourstep_split
        n1, n2 = best_fourstep_split(N)
        if backend == "fourstep4m":
            if n1 <= 1:
                raise ValueError(
                    f"backend='fourstep4m' needs composite N (N={N} is "
                    "prime); use backend='auto'")
            return "fourstep4m", (n1, n2)
        # The budget-truth bands (probes/windowed_comp.py and the
        # round-4 unwindowed tail audit, probes/unwindowed_2e17_tail.py
        # — BENCHMARKS.md "Unwindowed large-N tail audit"):
        # * windowed (2^18, 2^19]: the plain fourstep fails the 1.5x
        #   median (1.94x) and the hybrid is stage-1-bound (1.88x);
        # * UNWINDOWED (8192, 2^18) non-pallas: every audited hybrid
        #   BREACH lies in this range (distribution maxima 3.29x at
        #   2^17, 9.36x at 49152, 5.41x at 65536 — over the documented
        #   <=3x max budget — with per-seed ratios to 28x and p99
        #   5.8-17.5), while from 2^18 up the hybrid's tail thins
        #   monotonically (p99 3.8 / 3.6 / ~2 at 2^18 / 2^19 / 2^20,
        #   distribution maxima <=1.46) as the class error outgrows
        #   its absolute excess — the same recovery the windowed band
        #   showed. The plain fourstep also breaches at 2^19 (3.37x,
        #   its unsplit-twiddle term); the compensated form is the
        #   only candidate that passes EVERY audited size (max
        #   <=1.43x, per-seed p99 <=2.8x).
        # * WINDOWED below the fourstep4x band (N < 1024 or N not
        #   divisible by 8): fourstep4m strictly passes at 512 (0.89x;
        #   and WINS speed, 37.1 vs 7.8 GS/s vs plain fourstep) and
        #   halves the plain fourstep's distance elsewhere; the
        #   session band 1024-16384 itself moved to fourstep4x in
        #   round 5 (med 0.40-1.06x strict — see the fourstep4x block
        #   above and BENCHMARKS "Windowed session-size stage-1 fix").
        # * WINDOWED (8192, 65536) non-pallas: the plain fourstep
        #   BREACHES the max budget at 12288 (3.27x; med 3.59x) and
        #   fourstep4m dominates or strictly passes (1.64x/2.13x at
        #   12288, 1.35x/1.56x PASS at 32768); fourstep keeps
        #   [65536, 2^18] where it passes the strict yard outright
        #   (1.38x/1.50x/1.29x at 65536/2^17/2^18).
        if (tpu and n1 >= 8
                and ((windowed and (N < 65536
                                    or (1 << 18) < N <= (1 << 19)))
                     or (not windowed and 8192 < N < (1 << 18)))):
            return "fourstep4m", (n1, n2)
    if backend in ("hybrid", "auto"):
        from .dft import best_fourstep_split, best_hybrid_split
        if backend == "hybrid" or tpu:
            n1, n2 = best_hybrid_split(N, min_n1=8)
        else:
            n1, n2 = best_fourstep_split(N)
        if backend == "hybrid":
            ok = n1 > 1
        else:
            # Auto hybrid: the session band 512-3072 (unwindowed; its
            # 100-seed tails are enforced there), unwindowed TPU
            # N >= 2^18 (the round-4 tail audit retreated it from
            # (8192, 2^18) — distribution maxima up to 9.36x class,
            # see the fourstep4m block above — while at 2^18/2^19/2^20
            # it passes with thinning tails and is 2-3x the compensated
            # four-step's speed: 6.8/6.9/10.6 vs 3.1/2.3 GS/s), and
            # windowed TPU N > 2^19 (the windowed ladder's decision).
            ok = (n1 >= 8 and not windowed_cpu
                  and ((512 <= N <= 3072 and not windowed)
                       or (tpu and 64 <= n2 <= 512
                           and ((not windowed and N >= (1 << 18))
                                or (windowed and N > (1 << 19))))))
        if ok:
            return "hybrid", (n1, n2)
    if backend in ("fourstep", "auto"):
        from .dft import best_fourstep_split
        n1, n2 = best_fourstep_split(N)
        if backend == "fourstep":
            ok = n1 > 1  # honor an explicit request for any composite N
        else:
            ok = (n1 >= 8 and not windowed_cpu
                  and ((N < 512 and not (tpu and windowed))
                       or (tpu and ((N <= 8192 and not windowed)
                                    or (windowed
                                        and 8192 < N <= 262144)))))
        if ok:
            return "fourstep", (n1, n2)
    if backend in ("fft4", "auto") and (N > 8192 or backend == "fft4"):
        from .dft import best_fourstep_split
        n1, n2 = best_fourstep_split(N)
        if n1 >= 8 or (backend == "fft4" and n1 > 1):
            return "fft4", (n1, n2)
        if backend == "fft4":
            raise ValueError(
                f"backend='fft4' needs composite N (N={N} is prime); "
                "use backend='auto'")
    if backend == "bluestein" or (backend == "auto" and tpu
                                  and N > FFT_FALLBACK_MAX_N):
        # Awkward factorizations (2·prime class: no factor >= 8) above
        # the matmul-DFT cap. The reference plans ANY N through FFTW
        # (datastore.cxx:30-33); the TPU-owned equivalent is the chirp-Z
        # rung — one pow-2 circular convolution riding the framework's
        # batched-short-FFT stages, so the platform's monolithic FFT
        # lowering (slow at large N, compile-REFUSED at 2^16..2^20 on
        # the current toolchain, see warn_fft_compile_fallback) is never
        # touched. Measured FFTW-class accurate (≪1e-5 on realistic
        # inputs, ~3e-6 under a 35 dB tone at N=99998). On CPU the
        # platform FFT IS the class and plans any N — keep xla there.
        return "bluestein", None
    return "xla", None


def tapered_batch_mode(N: int) -> str:
    """Transform choice for estimator steps whose input planes are
    already windowed-class (multitaper's tapered batch, the PFB's
    polyphase sums) or that need per-frame spectra (the SK family):
    on TPU, "fourstep" — the all-matmul four-step (tone-robust on the
    windowed band, never touches the platform's monolithic-FFT
    lowering) — for any composite N with a factor >= 8 (round 4 lifted
    the old 65536 cap: the matmul stages lower at any size, while the
    "xla" mode would hand 2^17-class estimator sessions to the
    monolithic lowering that is compile-REFUSED with client poisoning
    on the current toolchain); "bluestein" — the chirp-Z transform —
    for awkward N above the matmul-fallback cap (2·prime class, same
    rationale as the PSD ladder's bluestein rung); "xla" — the
    platform FFT — elsewhere (CPU, where it IS the class yardstick,
    and small awkward N on TPU where it compiles)."""
    from .dft import best_fourstep_split
    n1, _ = best_fourstep_split(N)
    if jax.default_backend() == "tpu":
        if n1 >= 8:
            return "fourstep"
        if N > FFT_FALLBACK_MAX_N:
            return "bluestein"
        # Small awkward N: the monolithic platform FFT when it proves
        # compilable out-of-process (same resolver as the PSD xla
        # rung — on the current toolchain it refuses at EVERY size,
        # so this degrades to the matmul per-frame transform).
        return resolve_xla_rung(N, True, "the estimator transform")
    return "xla"


class PsdStep:
    """A jitted device step: (F, 2N) u8 frames → (N,) f32 partial power sum.

    One instance owns one compiled executable per (N, F, windowed) signature.
    ``n_valid`` masks out padding rows so the step shape never changes
    (static shapes: one compilation, no retraces).
    """

    def __init__(self, N: int, frames_per_step: int,
                 window: Optional[np.ndarray] = None,
                 backend: str = "auto",
                 precision: str = "highest"):
        """``precision``: 'highest' (default; 2.8e-7 measured error, the
        1e-5 parity budget) or 'high' (bf16x3 matmuls: ~+19% throughput,
        ~2.4e-5 error — opt-in for parity-relaxed deployments)."""
        if N % 2 != 0:
            raise ValueError("N must be even")
        if precision not in ("highest", "high"):
            raise ValueError("precision must be 'highest' or 'high'")
        self._precision = (jax.lax.Precision.HIGHEST if precision == "highest"
                           else jax.lax.Precision.HIGH)
        self.N = N
        # Small batches (e.g. the 1M-point long-integration mode) keep a
        # small F; the two-stage sum chunk adapts to the largest
        # power-of-two divisor so padding waste stays bounded.
        self.F, self._chunk = adapt_batch(frames_per_step)
        self.backend = backend
        self.window = None
        if window is not None:
            w = np.asarray(window, dtype=np.float32)
            if w.shape != (N,):
                raise ValueError(f"window must have shape ({N},), got {w.shape}")
            self.window = w
        self._power = _power_backend(backend, N)
        self._nv_full = None
        self._u16_in = False   # set by _make_step when the pallas kernel ships
        #: which ladder rung _make_step selected for this (N, F, window,
        #: backend, platform) signature: "pallas" | "hybrid" |
        #: "fourstep" | "fourstep4m" | "fourstep4x" | "fft4" |
        #: "bluestein" | "xla"
        #: (plus "matmul" — explicit request, compile fallback, or
        #: pre-flight downgrade) — introspection for band tests
        #: and users (auto resolves per platform).
        self.path = "matmul" if backend == "matmul" else "xla"
        self._step = jax.jit(self._make_step())

    def _make_step(self):
        N, F = self.N, self.F
        window = None if self.window is None else jnp.asarray(self.window)
        power_fn = self._power


        if (self.backend == "auto"
                and self._precision != jax.lax.Precision.HIGHEST):
            # precision='high' (relaxed parity): the FFT four-step is the
            # fastest step only at SMALL N now — measured v5e GS/s vs
            # the round-3 lane-matched hybrid defaults: N=512 16.3 vs
            # 12.0 (+35%), N=1024 15.6 vs 14.9 (+5%); from 2048 up the
            # tone-robust default is FASTER (13.4 vs 11.3-11.8), so the
            # relaxed path would be a pure loss and the band stops at
            # 1024. Its error is f32-XLA-FFT class: ~2e-7 on uniform
            # input but up to ~9e-5 under a 35 dB tone at 2048
            # (measured, probes/fftfourstep_sweep.py) — hence opt-in.
            from .dft import best_fourstep_split, fourstep_fft_psd_partial
            n1_, _ = best_fourstep_split(N)
            if n1_ >= 8 and N <= 1024:
                self._u16_in = True
                self.path = "fft4"
                chunk = self._chunk
                windowed_arr = window

                def fast_step(raw16: jax.Array, n_valid: jax.Array) -> jax.Array:
                    re, im = dequant_iq_u16(raw16, windowed_arr)
                    fmask = (jax.lax.broadcasted_iota(jnp.int32, (F,), 0)
                             < n_valid).astype(jnp.float32)
                    return fourstep_fft_psd_partial(re, im, fmask,
                                                    chunk=chunk)

                return fast_step

        # Band selection lives ONCE in select_transform_rung (shared
        # with ShardedPsdStep); this builder only constructs the chosen
        # rung's step closure.
        tpu = jax.default_backend() == "tpu"
        windowed = window is not None
        path, split = select_transform_rung(N, F, windowed, self.backend,
                                            tpu)

        if (path == "fourstep4m" and self.backend == "auto"
                and not windowed
                and self._precision != jax.lax.Precision.HIGHEST):
            # The relaxed tier's documented contract is the FASTEST
            # relaxed-parity step per size: on the UNWINDOWED
            # (8192, 2^18) band that is the hybrid (e.g. 7.7 vs ~4.3
            # GS/s at 2^17) — its class-budget tail is exactly what the
            # DEFAULT band retreated from, and --precision high
            # explicitly trades that guarantee away. (The hybrid branch
            # below still clamps its own matmul precision to HIGHEST
            # on this band — the relaxed stage-2 was measured a pure
            # loss there.) The WINDOWED fourstep4m bands keep the
            # compensated path even under --precision high: windowed
            # hybrid medians were measured at 2.4-6.4x class
            # (probes/windowed_fold.py) — a far larger accuracy drop
            # than the relaxed tier documents — and the hybrid is not
            # even reliably faster there (fourstep4m WINS speed at
            # windowed 512/2048, BENCHMARKS "Windowed session-size
            # audit"); round-4 advisor finding.
            from .dft import best_hybrid_split
            path = "hybrid"
            split = best_hybrid_split(N, min_n1=8)

        if (path == "fourstep4x" and self.backend == "auto"
                and self._precision != jax.lax.Precision.HIGHEST):
            # Relaxed tier on the windowed session band: the fused
            # kernel is the fastest relaxed-parity step at its shapes
            # (12.5-13.0 GS/s vs the split-pass four-step's 2.7-12.6;
            # its windowed strict-yard medians 1.55-1.90x are exactly
            # the accuracy --precision high trades away). Non-kernel
            # shapes keep the budget-true split-pass path.
            from .kernels.fused_psd import fused_psd_available
            if fused_psd_available(N, F, windowed=windowed):
                path, split = "pallas", None

        if path == "pallas":
            from .kernels.fused_psd import make_fused_psd_fn
            fused = make_fused_psd_fn(
                N, F, windowed=windowed,
                fast=self._precision != jax.lax.Precision.HIGHEST)
            # The interleaved (re, im) u8 pair is one little-endian u16
            # lane. The reinterpretation is FREE on the host
            # (ndarray.view) but a real relayout pass if done on device
            # (measured 29% of the whole step) — so the pallas step
            # takes (F, N) u16 and __call__ views the host buffer.
            self._u16_in = True
            self.path = "pallas"

            def pallas_step(raw16: jax.Array, n_valid: jax.Array) -> jax.Array:
                if window is not None:
                    return fused(raw16, n_valid, window)
                return fused(raw16, n_valid)

            return pallas_step

        fused_partial = None
        precision_cfg = self._precision
        if path == "hybrid":
            from .dft import fourstep_hybrid_psd_partial
            fused_partial = (fourstep_hybrid_psd_partial, *split)
            self._u16_in = True   # host-side u16 view input
            self.path = "hybrid"
            if (N > 8192
                    and precision_cfg != jax.lax.Precision.HIGHEST):
                # Measured PURE LOSS on the large-N band (v5e,
                # probes/large_n_fast.py at 2^20): Precision.HIGH
                # stage-2 runs SLOWER than HIGHEST (1094 vs 620
                # us/step — the conv emitters XLA picks for these
                # shapes have no fast 3-pass path) at ~100x worse
                # tone error. Honoring the relaxed tier here would
                # give strictly worse service on both axes, so the
                # step keeps HIGHEST and says so.
                import sys as _sys
                print("Note: --precision high is slower AND less "
                      f"accurate on the large-N hybrid (N={N}) — "
                      "measured pure loss; using highest.",
                      file=_sys.stderr)
                precision_cfg = jax.lax.Precision.HIGHEST
        elif path == "fourstep":
            from .dft import fourstep_psd_partial
            fused_partial = (fourstep_psd_partial, *split)
            self.path = "fourstep"
            # Host-side u16 view like every other fused path — the
            # device-side u8→u16 bitcast is a real relayout pass
            # (measured: the u8-input four-step at 8192 read 9.9
            # GS/s vs 15.5 with the view, probes/pow2_head2head.py
            # vs probes/midband_hybrid.py).
            self._u16_in = True
        elif path == "fft4":
            from .dft import fourstep_fft_psd_partial
            precision_cfg = None  # FFT stages have no matmul knob
            fused_partial = (fourstep_fft_psd_partial, *split)
            self.path = "fft4"
            # Take the IQ pairs as u16 lanes (host-side view): the
            # device-side (F, 2N)u8 → u16 bitcast is a real relayout
            # pass that costs ~3.5 ms at N=2^20 (over half the step).
            self._u16_in = True
        elif path == "fourstep4m":
            from .dft import fourstep4m_psd_partial
            fused_partial = (fourstep4m_psd_partial, *split)
            self.path = "fourstep4m"
            self._u16_in = True   # host-side u16 view like the family
        elif path == "fourstep4x":
            from .dft import fourstep4x_psd_partial
            fused_partial = (fourstep4x_psd_partial, *split)
            self.path = "fourstep4x"
            self._u16_in = True   # host-side u16 view like the family
        elif path == "xla":
            # The only rung whose lowering the framework doesn't own:
            # pre-flight refusal-prone sizes out-of-process and
            # pre-emptively downgrade (see resolve_xla_rung).
            path = resolve_xla_rung(N, tpu, "the step")
            if path == "matmul":
                self._power = power_fn = _power_backend("matmul", N)
            self.path = path
        if path == "bluestein":
            from .dft import bluestein_psd_partial
            precision_cfg = None  # chirp-Z has no matmul knob
            fused_partial = (bluestein_psd_partial, None, None)
            self.path = "bluestein"
            self._u16_in = True   # host-side u16 view like the others
        if self._precision != jax.lax.Precision.HIGHEST:
            fp_name = fused_partial[0].__name__ if fused_partial else None
            if fused_partial is None:
                import sys as _sys
                print("Warning: --precision high affects the fused Pallas "
                      "kernel (TPU, power-of-2 4096-65536), the FFT "
                      "four-step fast path (composite N <= 1024), and the "
                      "hybrid/matmul four-step stage-2 matmuls (composite "
                      f"N); this step (backend={self.backend}, N={N}) "
                      "ignores it.", file=_sys.stderr)
            elif fp_name in ("fourstep_fft_psd_partial",
                             "bluestein_psd_partial"):
                import sys as _sys
                print("Note: --precision high is a no-op on the "
                      f"{'chirp-Z' if 'blue' in fp_name else 'FFT four-step'} "
                      f"path selected here (backend={self.backend}, "
                      f"N={N}): its FFT stages have no matmul precision "
                      "knob.", file=_sys.stderr)
        chunk = self._chunk
        u16_in = self._u16_in

        def step(raw: jax.Array, n_valid: jax.Array) -> jax.Array:
            # raw: (F, 2N) uint8 interleaved IQ — or (F, N) uint16 when
            # the step takes the host-side u16 view; n_valid: scalar i32.
            if u16_in:
                re, im = dequant_iq_u16(raw, window)
            else:
                re, im = dequant_iq(raw, F, N, window)
            fmask = (jax.lax.broadcasted_iota(jnp.int32, (F,), 0)
                     < n_valid).astype(jnp.float32)
            if fused_partial is not None:
                fn, n1, n2 = fused_partial
                return fn(re, im, fmask, n1, n2, chunk=chunk,
                          precision=precision_cfg)
            pwr = power_fn(re, im)  # (F, N) f32, unshifted bins
            pwr = pwr * fmask[:, None]
            # Two-stage tree sum for f32 accuracy.
            g = F // chunk
            partial = pwr.reshape(g, chunk, N).sum(axis=1).sum(axis=0)
            return partial

        return step

    def __call__(self, raw: np.ndarray, n_valid: int) -> jax.Array:
        """Dispatch one step. ``raw`` is (F, 2N) u8 (padded), ``n_valid``
        the number of real frames. Returns the device array (async).

        The all-frames-valid scalar is cached device-side: re-uploading a
        host scalar per step costs real latency on remote-attached TPUs.
        """
        if self._u16_in and raw.dtype == np.uint8:
            raw = raw.view(np.uint16)  # free reinterpretation on the host
        if n_valid == self.F:
            if self._nv_full is None:
                self._nv_full = jnp.int32(self.F)
            nv = self._nv_full
        else:
            nv = jnp.int32(n_valid)
        try:
            return self._step(raw, nv)
        except Exception as e:  # noqa: BLE001 - filtered in the handler
            if not self._fallback_to_matmul(e):
                raise
            return self._step(raw, nv)

    def _fallback_to_matmul(self, e: Exception) -> bool:
        """Last-resort compile resilience for auto's final ladder rung.

        Every rung above the monolithic platform FFT is measured and
        shape-gated, but the "xla" rung (prime and 2·prime N, degenerate
        splits) delegates lowering entirely to the backend — and a
        backend FFT emitter CAN refuse a shape (observed live on this
        toolchain: a remote-compile window returning UNIMPLEMENTED for
        bare FFT jits). The matmul DFT always lowers — it is plain MXU
        dot-generals — and shares the xla rung's u8 input convention, so
        the session degrades seamlessly instead of dying mid-acquisition
        (the reference never aborts on a plannable size either: FFTW
        plans ANY N, datastore.cxx:30-33). Returns True if the step was
        rebuilt and the dispatch should be retried."""
        if not (self.backend == "auto" and self.path == "xla"):
            return False
        if not warn_fft_compile_fallback(self.N, e, "the step"):
            return False  # runtime/user errors propagate untouched
        self._power = _power_backend("matmul", self.N)
        self.backend = "matmul"
        try:
            self._step = jax.jit(self._make_step())
        finally:
            self.backend = "auto"  # keep the user's request introspectable
        self.path = "matmul"
        return True

    def lowered_fn(self):
        """The raw jitted function, for entry-point/compile checks.

        NOTE: when the fused Pallas kernel is the selected path
        (``self.takes_u16``), the function takes (F, N) uint16 — the u8
        buffer viewed as little-endian IQ pairs — instead of (F, 2N) u8."""
        return self._step

    @property
    def takes_u16(self) -> bool:
        return self._u16_in

    def example_args(self) -> Tuple[np.ndarray, np.ndarray]:
        if self._u16_in:
            return np.zeros((self.F, self.N), dtype=np.uint16), np.int32(0)
        raw = np.zeros((self.F, 2 * self.N), dtype=np.uint8)
        return raw, np.int32(0)


class FrameSlicer:
    """Splits an arbitrary byte stream into (F, 2N) u8 frame batches.

    Host-side replacement for the reference's carry of ``fft_pointer``
    across buffers (datastore.cxx:52,66-80): remainder bytes from one
    buffer prepend the next. Optionally frames overlap (Welch mode,
    an extension): ``hop_bytes`` < frame_bytes keeps a tail overlap.
    """

    def __init__(self, N: int, hop: Optional[int] = None):
        self.frame_bytes = 2 * N
        hop = N if hop is None else int(hop)
        if not (0 < hop):
            raise ValueError("hop must be positive")
        self.hop_bytes = 2 * hop
        self._carry = np.zeros(0, dtype=np.uint8)

    def reset(self) -> None:
        self._carry = np.zeros(0, dtype=np.uint8)

    def push(self, data: np.ndarray, max_frames: Optional[int] = None) -> np.ndarray:
        """Append bytes; return all complete frames as (n, 2N) u8.

        ``max_frames`` caps the frames produced (reference stops filling
        FFTs once ``repeats`` is reached, datastore.cxx:67 — remaining
        bytes are discarded by the caller simply by not pushing more).

        CONTRACT: on the aligned fast path the returned frames are a
        zero-copy VIEW of ``data`` — consume or copy them before reusing
        or mutating the input buffer. The internal carry is always an
        owned copy, never an alias of caller memory.
        """
        fb, hb = self.frame_bytes, self.hop_bytes
        if max_frames is not None and int(max_frames) <= 0:
            # The acquisition already has all the frames it will ever take
            # (datastore.cxx:67 stops at ``repeats``): discard instead of
            # growing the carry — an over-reading producer would otherwise
            # cause quadratic re-concatenation and unbounded host memory.
            self._carry = np.zeros(0, dtype=np.uint8)
            return np.zeros((0, fb), dtype=np.uint8)
        data = np.asarray(data, dtype=np.uint8).ravel()
        if len(self._carry):
            buf = np.concatenate([self._carry, data])
        else:
            buf = data  # aligned fast path: no copy of the whole buffer
        if len(buf) < fb:
            self._carry = np.array(buf, copy=True)
            return np.zeros((0, fb), dtype=np.uint8)
        n = 1 + (len(buf) - fb) // hb
        if max_frames is not None:
            n = min(n, int(max_frames))
        if hb == fb:
            flat = buf[:n * fb]
            frames = flat.reshape(n, fb)  # view, no copy
        else:
            idx = (np.arange(n)[:, None] * hb) + np.arange(fb)[None, :]
            frames = buf[idx]
        # Detach the (small) carry so it doesn't pin the whole buffer.
        self._carry = np.array(buf[n * hb:], copy=True)
        return frames


def bin_frequencies(tuned_freq: int, N: int, actual_samplerate: int) -> np.ndarray:
    """Per-bin frequency axis (acquisition.cxx:391):
    freq_i = tuned_freq + (i − N/2.0)·actual_samplerate/N, in float64."""
    i = np.arange(N, dtype=np.float64)
    return tuned_freq + (i - N / 2.0) * actual_samplerate / N


def finalize_psd(pwr: np.ndarray, repeats_done: int, actual_samplerate: int,
                 linear: bool = False,
                 baseline: Optional[np.ndarray] = None,
                 already_shifted: bool = False) -> np.ndarray:
    """Turn an accumulated (unshifted) power vector into output PSD values.

    Mirrors acquisition.cxx:376-399 in float64:
      fftshift → DC-bin interpolation → /repeats/N/rate → 10·log10 (unless
      linear) → baseline subtraction (baseline is in *output* units, i.e.
      subtracted after the dB conversion).
    Returns the per-bin values; the caller formats/writes them.
    """
    pwr = np.asarray(pwr, dtype=np.float64)
    N = pwr.shape[-1]
    shifted = pwr.copy() if already_shifted else np.fft.fftshift(pwr, axes=-1)
    # Interpolate the central point to cancel DC bias (acquisition.cxx:376-377).
    shifted[..., N // 2] = (shifted[..., N // 2 - 1] + shifted[..., N // 2 + 1]) / 2.0
    psd = shifted / repeats_done / N / actual_samplerate
    if not linear:
        with np.errstate(divide="ignore"):
            psd = 10.0 * np.log10(psd)
    if baseline is not None:
        psd = psd - np.asarray(baseline, dtype=np.float64)
    return psd
