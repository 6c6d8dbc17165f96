"""Multi-stream acquisition: S parallel IQ sources → one averaged spectrum.

BASELINE.json config 5: "16 parallel IQ streams sharded across a TPU mesh
with psum-reduced averaged spectra".  Each stream gets its own producer
thread (its own reader, its own frame slicer, its own repeat counter — the
multi-device generalization of the reference's single producer loop,
acquisition.cxx:276-332); frame batches from all streams are assembled
into one (S, F, 2N) device step sharded over the ``stream`` mesh axis,
and the cross-stream sum arrives via the step's psum.

The result is numerically identical to running the reference S times and
summing the ``pwr`` accumulators — power accumulation commutes with any
partition of the spectra.
"""

from __future__ import annotations

import dataclasses
import threading
from typing import List, Optional, Sequence

import numpy as np

from ..config import Params
from ..ops.spectral import FrameSlicer, _SUM_CHUNK
from ..sources.base import IQSource
from .mesh import make_mesh
from .sharded import ShardedPsdStep


@dataclasses.dataclass
class MultiStreamResult:
    pwr: np.ndarray            # (N,) float64 combined, unshifted bins
    per_stream_pwr: np.ndarray  # (S, N) float64, unshifted bins
    repeats_done: np.ndarray   # (S,) int64 spectra per stream


class MultiStreamAcquisition:
    """Drive S sources for ``repeats`` spectra each and reduce over the mesh."""

    def __init__(self, params: Params, sources: Sequence[IQSource],
                 window: Optional[np.ndarray] = None,
                 mesh=None, frames_per_step: int = 0):
        self.params = params
        self.sources = list(sources)
        S = len(self.sources)
        if mesh is None:
            import jax
            n_dev = len(jax.devices())
            # Largest device count that divides the stream count.
            while S % n_dev != 0:
                n_dev -= 1
            mesh = make_mesh(n_dev)
        if frames_per_step <= 0:
            frames_per_step = max(
                _SUM_CHUNK,
                min(params.buf_length // (2 * params.N), 2048))
        self.step = ShardedPsdStep(
            mesh, params.N, frames_per_step, streams=S, window=window,
            backend=params.fft_backend if params.fft_backend != "pallas"
            else "auto")
        self.S = S
        # Welch overlap applies per stream, same as the single-stream
        # Datastore (pipeline/datastore.py).
        self._hop = None
        if params.welch_overlap > 0.0:
            self._hop = max(1, int(round(
                params.N * (1.0 - params.welch_overlap / 100.0))))

    def run(self, freq: int) -> MultiStreamResult:
        params = self.params
        N, F, S = params.N, self.step.F, self.S
        frame_bytes = 2 * N

        # Per-stream staging for one device step.
        staging = np.zeros((S, F, frame_bytes), dtype=np.uint8)
        pwr = np.zeros(N, dtype=np.float64)
        per_stream = np.zeros((S, N), dtype=np.float64)
        done = np.zeros(S, dtype=np.int64)

        lock = threading.Lock()
        errors: List[BaseException] = []

        def produce(s: int, out_frames: List[np.ndarray]) -> None:
            """Read this stream's full measurement and slice into frames."""
            from ..exceptions import RPFexception, TuneError
            from ..interrupts import InterruptState, check_interrupt
            try:
                src = self.sources[s]
                # Same 3-try tune persuasion as the single-stream path
                # (acquisition.cxx:229-249); a persistently dead frequency
                # becomes a TuneError so the session drops it from the hop
                # list instead of dying with a hardware error.
                tuned = False
                for _try in range(3):
                    try:
                        src.set_frequency(freq)
                        if src.frequency() != 0:
                            tuned = True
                            break
                    except RPFexception:
                        pass
                if not tuned:
                    raise TuneError(freq)
                slicer = FrameSlicer(N, hop=self._hop)
                data_total = 2 * N * params.repeats
                data_read = 0
                frames = []
                n_frames = 0
                while data_read < data_total:
                    need = min(params.buf_length, data_total - data_read)
                    buf, ok = src.read(need)
                    if ok:
                        data_read += need
                        got = slicer.push(buf,
                                          max_frames=params.repeats - n_frames)
                        if len(got):
                            frames.append(got)
                            n_frames += len(got)
                    # else: dropped samples — discard and retry.
                    if check_interrupt(InterruptState.FinishNow):
                        break
                out_frames.append(np.concatenate(frames) if frames
                                  else np.zeros((0, frame_bytes), np.uint8))
            except BaseException as e:
                with lock:
                    errors.append(e)
                out_frames.append(np.zeros((0, frame_bytes), np.uint8))

        # Read all streams in parallel (producers), then step through the
        # device in (S, F) batches.
        results: List[List[np.ndarray]] = [[] for _ in range(S)]
        threads = [threading.Thread(target=produce, args=(s, results[s]))
                   for s in range(S)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if errors:
            from ..exceptions import TuneError
            for e in errors:
                if isinstance(e, TuneError):
                    raise e  # drop the frequency, don't kill the session
            raise errors[0]

        all_frames = [r[0] for r in results]
        max_frames = max(len(f) for f in all_frames)
        for start in range(0, max_frames, F):
            n_valid = np.zeros(S, dtype=np.int32)
            staging[:] = 0
            for s in range(S):
                batch = all_frames[s][start:start + F]
                n_valid[s] = len(batch)
                if len(batch):
                    staging[s, :len(batch)] = batch
            ps, combined = self.step(staging.copy(), n_valid)
            per_stream += np.asarray(ps, dtype=np.float64)
            pwr += np.asarray(combined, dtype=np.float64)
            done += n_valid.astype(np.int64)

        return MultiStreamResult(pwr=pwr, per_stream_pwr=per_stream,
                                 repeats_done=done)
