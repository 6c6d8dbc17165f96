"""Multi-stream sharded PSD accumulation over a device mesh.

TPU-native replacement for "average many spectra" at scale
(BASELINE.json config 5: 16 parallel IQ streams sharded across a TPU mesh
with psum-reduced averaged spectra).  Streams are laid out on a 1-D
``stream`` mesh axis with ``shard_map``; each device runs the same fused
dequant→window→FFT→|X|² step on its local streams, and the cross-stream
average is ONE ``psum`` of the (N,)-shaped partial sums over ICI — the
collective-equivalent of the reference's serial accumulation loop
(datastore.cxx:82-87).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # stable API (jax >= 0.4.35)
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..ops.spectral import (_power_backend, adapt_batch, dequant_iq,
                            dequant_iq_u16)


class ShardedPsdStep:
    """Jitted multi-device step: (S, F, 2N) u8 → per-stream (S, N) partials
    and/or a psum-combined (N,) partial, with streams sharded on the mesh.

    ``n_valid`` is (S,) — per-stream valid-frame counts, so streams may
    progress unevenly (e.g. different drop rates) without reshape.
    """

    def __init__(self, mesh: Mesh, N: int, frames_per_step: int,
                 streams: int, window: Optional[np.ndarray] = None,
                 backend: str = "auto", combine: bool = True):
        if N % 2 != 0:
            raise ValueError("N must be even")
        axis = mesh.axis_names[0]
        n_dev = mesh.devices.size
        if streams % n_dev != 0:
            raise ValueError(
                f"streams ({streams}) must be divisible by mesh size ({n_dev})")
        self.mesh = mesh
        self.axis = axis
        self.N = N
        self.S = streams
        self.F, self._chunk = adapt_batch(frames_per_step)
        self.combine = combine
        #: the REQUESTED backend (same public contract as PsdStep.backend;
        #: ``path`` below is what the ladder actually selected).
        self.backend = backend
        window_arr = None
        if window is not None:
            window_arr = jnp.asarray(np.asarray(window, dtype=np.float32))
        power_fn = _power_backend(backend, N)
        N_, F_, chunk = self.N, self.F, self._chunk

        # Same path selection as PsdStep's auto: the fused Pallas kernel
        # (streams variant: per-stream masking + per-stream output tiles)
        # on real TPUs for large power-of-two N; the transpose-free
        # four-step with fused per-stream reduction for composite N up to
        # the measured crossover; XLA FFT otherwise.
        self._u16_in = False
        #: selected ladder rung ("pallas" | "hybrid" | "fourstep" |
        #: "fft4" | "xla" | "matmul" — the last via explicit request or
        #: the compile fallback) — same introspection contract as
        #: PsdStep.path.
        self.path = "matmul" if backend == "matmul" else "xla"
        pallas_kernel = None
        fused = None
        if backend in ("pallas", "auto"):
            from ..ops.kernels.fused_psd import (fused_psd_available,
                                                 make_fused_psd_fn)
            windowed = window_arr is not None
            S_local = streams // n_dev
            eligible = fused_psd_available(N, self.F, windowed=windowed)
            # Same band as PsdStep's auto (4096-65536): the u16-view
            # sharded hybrid wins 512-3072 (the round-2 bitcast
            # exception no longer applies) and the large-N hybrid takes
            # 2^17 (equal speed, ~3x better tone accuracy).
            # Windowed band is 8192-32768 (PsdStep rule: the in-kernel
            # window multiply costs the kernel 40% at 4096 where the
            # direct four-step wins on both axes, and at 65536 the
            # four-step wins both axes again —
            # probes/windowed_pow2_direct.py).
            lo = 8192 if windowed else 4096
            hi = 32768 if windowed else 65536
            want = (backend == "pallas"
                    or (eligible and lo <= N <= hi
                        and jax.default_backend() == "tpu"))
            if want and eligible:
                pallas_kernel = make_fused_psd_fn(
                    N, self.F, windowed=windowed, streams=S_local)
                self._u16_in = True
                self.path = "pallas"
        if pallas_kernel is None and backend in ("hybrid", "auto"):
            # The hybrid four-step serves the band the streams kernel
            # can't. Round-3 change: the fused four-step family now takes
            # the host-side u16 VIEW of the IQ pairs (like PsdStep), so
            # the device-side u8→u16 bitcast that made the round-2
            # sharded hybrid lose to the Pallas streams kernel (7.8 vs
            # 9.2-10.0 GS/s at config-5 shapes) is gone.
            from ..ops.dft import (best_hybrid_split,
                                   fourstep_hybrid_psd_partial)
            # Same bands and split chooser as PsdStep's auto: the
            # lane-matched split (N2 ≈ 128, stage-1 FFT length ≥ 8 —
            # measured 2-32% faster at equal-or-better tone error) on
            # TPU and for explicit requests; near-square on CPU auto
            # (its BLAS accumulation tail doubles with K —
            # ops/spectral.py).
            if backend == "hybrid" or jax.default_backend() == "tpu":
                n1, n2 = best_hybrid_split(N, min_n1=8)
            else:
                from ..ops.dft import best_fourstep_split
                n1, n2 = best_fourstep_split(N)
            tpu = jax.default_backend() == "tpu"
            # Windowed auto skips the hybrid (PsdStep band note: the
            # multiply takes stage 1 off integer inputs — 2.8-3.1x class
            # medians); windowed CPU auto skips every matmul-stage path
            # (the CPU XLA FFT is the class yardstick itself).
            w_here = window_arr is not None
            windowed_cpu = w_here and not tpu
            if (n1 > 1 if backend == "hybrid"
                    else (n1 >= 8 and not windowed_cpu
                          and ((512 <= N <= 3072 and not w_here)
                               or (tpu and N > 8192 and 64 <= n2 <= 512
                                   and (not w_here or N > 65536))))):
                fused = (fourstep_hybrid_psd_partial, n1, n2)
                self.path = "hybrid"

        if (pallas_kernel is None and fused is None
                and backend in ("fourstep", "auto")):
            from ..ops.dft import best_fourstep_split, fourstep_psd_partial
            n1, n2 = best_fourstep_split(N)
            tpu = jax.default_backend() == "tpu"
            w_here = window_arr is not None
            windowed_cpu = w_here and not tpu
            # Windowed TPU (8192, 65536] goes to the all-matmul
            # four-step wherever the kernel doesn't take it (PsdStep
            # band note; probes/windowed_pow2_direct.py).
            if (n1 > 1 if backend == "fourstep"
                    else (n1 >= 8 and not windowed_cpu
                          and (N < 512
                               or (tpu and (N <= 8192
                                            or (w_here and N <= 65536)))))):
                fused = (fourstep_psd_partial, n1, n2)
                self.path = "fourstep"
        if (pallas_kernel is None and fused is None
                and backend in ("fft4", "auto")
                and (N > 8192 or backend == "fft4")):
            # Very-large-N (e.g. the frame-sharded 1M mode, longint.py):
            # the two-level FFT four-step beats the monolithic XLA FFT —
            # see ops/spectral.py's auto rule and probes/fftfourstep_sweep.
            from ..ops.dft import best_fourstep_split, fourstep_fft_psd_partial
            n1, n2 = best_fourstep_split(N)
            # Same explicit-request semantics as PsdStep (spectral.py):
            # auto needs n1 >= 8; explicit fft4 is honored for any
            # composite N and is an error on prime N.
            if n1 >= 8 or (backend == "fft4" and n1 > 1):
                fused = (fourstep_fft_psd_partial, n1, n2)
                self.path = "fft4"
            elif backend == "fft4":
                raise ValueError(
                    f"backend='fft4' needs composite N (N={N} is prime); "
                    "use backend='auto'")

        def local_step_pallas(raw16, n_valid, *w):
            # raw16: (S_local, F, N) u16 (host-side view of the u8 pairs).
            S_l = raw16.shape[0]
            per_stream = pallas_kernel(
                raw16.reshape(S_l * F_, N_), n_valid,
                *(w if w else ())).reshape(S_l, N_)
            combined = jax.lax.psum(per_stream.sum(axis=0), axis)
            return per_stream, combined

        if fused is not None:
            self._u16_in = True
        u16_in = self._u16_in

        def local_step(raw, n_valid, *w):
            # raw: (S_local, F, 2N) u8 — or (S_local, F, N) u16 when the
            # step takes the free host-side view; n_valid: (S_local,) i32.
            S_local = raw.shape[0]
            if u16_in:
                re, im = dequant_iq_u16(raw.reshape(S_local * F_, N_),
                                        w[0] if w else None)
            else:
                re, im = dequant_iq(raw.reshape(S_local * F_, 2 * N_),
                                    S_local * F_, N_, w[0] if w else None)
            fmask = (jax.lax.broadcasted_iota(
                jnp.int32, (S_local, F_), 1)
                < n_valid[:, None]).astype(jnp.float32)
            if fused is not None:
                fn, n1, n2 = fused
                per_stream = jax.vmap(
                    lambda r, i, m: fn(r, i, m, n1, n2, chunk=chunk))(
                    re.reshape(S_local, F_, N_),
                    im.reshape(S_local, F_, N_), fmask)
            else:
                pwr = power_fn(re, im).reshape(S_local, F_, N_)
                pwr = pwr * fmask[:, :, None]
                g = F_ // chunk
                per_stream = pwr.reshape(S_local, g, chunk, N_).sum(2).sum(1)
            # Cross-stream reduction: local sum then one psum over ICI.
            combined = jax.lax.psum(per_stream.sum(axis=0), axis)
            return per_stream, combined

        in_specs = (P(axis), P(axis)) + ((P(),) if window_arr is not None else ())
        out_specs = (P(axis), P())
        # check_vma=False: pallas_call's out_shape cannot declare varying-
        # mesh-axes metadata, which the default vma check demands when a
        # kernel runs inside shard_map.
        sharded = shard_map(
            local_step_pallas if pallas_kernel is not None else local_step,
            mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False)
        self._window = window_arr
        self._step = jax.jit(sharded)
        self._raw_sharding = NamedSharding(mesh, P(axis))

    @property
    def takes_u16(self) -> bool:
        return self._u16_in

    def __call__(self, raw, n_valid) -> Tuple[jax.Array, jax.Array]:
        """raw: (S, F, 2N) u8, n_valid: (S,) int32 — numpy hosts arrays or
        already-placed jax Arrays (e.g. multi-host global Arrays).
        Returns (per_stream (S,N) f32 — sharded, combined (N,) f32 — replicated)."""
        if isinstance(raw, np.ndarray):
            if self._u16_in and raw.dtype == np.uint8:
                # Free host-side reinterpretation of the interleaved IQ
                # pairs as u16 lanes (the fused kernel's input convention).
                raw = raw.view(np.uint16)
            # Explicit host→device placement along the stream sharding, so
            # each device receives only its stream shard.
            raw = jax.device_put(raw, self._raw_sharding)
        if not isinstance(n_valid, jax.Array):
            n_valid = np.asarray(n_valid, dtype=np.int32)
        try:
            if self._window is not None:
                return self._step(raw, n_valid, self._window)
            return self._step(raw, n_valid)
        except Exception as e:  # noqa: BLE001 - filtered in the handler
            if not self._fallback_to_matmul(e):
                raise
            if self._window is not None:
                return self._step(raw, n_valid, self._window)
            return self._step(raw, n_valid)

    def _fallback_to_matmul(self, e: Exception) -> bool:
        """Same compile-failure resilience as PsdStep._fallback_to_matmul
        (see ops/spectral.py): auto's monolithic-FFT rung (prime/2·prime
        N) is the only one whose lowering the framework doesn't control;
        if the backend refuses it, rebuild on the matmul DFT locally
        (dot-generals always lower; same u8 convention) and retry."""
        from ..ops.spectral import warn_fft_compile_fallback
        if not (self.backend == "auto" and self.path == "xla"):
            return False
        if not warn_fft_compile_fallback(self.N, e, "the sharded step",
                                         " on each shard"):
            return False
        window_np = (None if self._window is None
                     else np.asarray(self._window))
        self.__init__(self.mesh, self.N, self.F, streams=self.S,
                      window=window_np, backend="matmul",
                      combine=self.combine)
        self.backend = "auto"  # the user's request stays introspectable
        self.path = "matmul"
        return True

    def example_args(self):
        if self._u16_in:
            raw = np.zeros((self.S, self.F, self.N), dtype=np.uint16)
        else:
            raw = np.zeros((self.S, self.F, 2 * self.N), dtype=np.uint8)
        nv = np.zeros((self.S,), dtype=np.int32)
        return (raw, nv) + ((np.asarray(self._window),)
                            if self._window is not None else ())
