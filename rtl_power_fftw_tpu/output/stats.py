"""Session-wide metadata bookkeeping.

The reference keeps this state in mutable process globals
(rtl_power_fftw.cxx:39-48, metadata.h:28-33), mutated from
``Acquisition::run`` and ``write_data``.  Here it lives on one object with
identical update ordering, so the ``.met`` sidecar comes out the same.
"""

from __future__ import annotations

import dataclasses
import time as _time


@dataclasses.dataclass
class SessionStats:
    # Matrix-mode counters (globals at rtl_power_fftw.cxx:40-41).
    metaRows: int = 1
    metaCols: int = 0
    # Scan-duration tracking (rtl_power_fftw.cxx:42-44).
    avgScanDur: float = 0.0
    sumScanDur: float = 0.0
    scanBeg: float = 0.0
    scanEnd: float = 0.0
    # Frequency extents, computed once from the first/last hop
    # (rtl_power_fftw.cxx:155-163).
    startFreq: int = 0
    endFreq: int = 0
    stepFreq: int = 0
    freqsMetaNeeded: bool = True
    # Timestamps (rtl_power_fftw.cxx:47-48).
    firstAcqTimestamp: str = ""
    lastAcqTimestamp: str = ""
    cntTimeStamps: int = 0

    def begin_scan(self, timestamp: str) -> None:
        """Acquisition start bookkeeping (acquisition.cxx:259-264)."""
        self.scanBeg = _time.time()
        if self.cntTimeStamps == 0:
            self.firstAcqTimestamp = timestamp
            self.cntTimeStamps += 1

    def end_scan(self, timestamp: str) -> None:
        """Acquisition end bookkeeping (acquisition.cxx:334-339)."""
        self.scanEnd = _time.time()
        self.lastAcqTimestamp = timestamp
        # difftime has whole-second resolution; keep float for smoother
        # averages (divergence: sub-second precision instead of truncation).
        self.sumScanDur += self.scanEnd - self.scanBeg
        self.avgScanDur = self.sumScanDur / self.metaRows
