"""Bounded soak: endless hop session on CPU, RSS must plateau.

Exercises the long-run paths the Welch-carry bug (ADVICE r1 #1) lived in:
buffer pool reuse, slicer carry, matrix append, .met refresh, zero-copy
view recycling. Runs ~25 s; prints RSS at ~5 s intervals and fails if
RSS keeps climbing in the second half.
"""
import sys
sys.path.insert(0, "/root/repo")
import os
os.environ["PALLAS_AXON_POOL_IPS"] = ""
import jax
jax.config.update("jax_platforms", "cpu")
import io
import threading
import time

import numpy as np

from rtl_power_fftw_tpu.auxdata import AuxData
from rtl_power_fftw_tpu.config import parse_args
from rtl_power_fftw_tpu.session import run_session
from rtl_power_fftw_tpu.sources import FileSource
import rtl_power_fftw_tpu.interrupts as interrupts


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024
    return 0.0


rec = "/tmp/soak.iq"
rng = np.random.default_rng(0)
with open(rec, "wb") as f:
    f.write(rng.integers(0, 256, 8 << 20, dtype=np.uint8).tobytes())

params = parse_args(
    ["-f", "100M:104M", "-n", "400", "-b", "512", "-c", "-q",
     "--welch-overlap", "50", "-m", "/tmp/soak",
     "--source", f"file:{rec}:loop"], stderr=io.StringIO())
src = FileSource(rec, loop=True)
aux = AuxData(params, stderr=io.StringIO())

samples = []
def monitor():
    t0 = time.time()
    while time.time() - t0 < 25:
        time.sleep(5)
        samples.append(rss_mb())
        print(f"t={time.time()-t0:4.0f}s RSS={samples[-1]:.0f} MB", flush=True)
    # End the endless session the way two Ctrl-C presses would.
    interrupts._handler(2, None)
    interrupts._handler(2, None)

mon = threading.Thread(target=monitor, daemon=True)
mon.start()
rv = run_session(params, src, aux, stdout=io.StringIO(), stderr=io.StringIO(),
                 install_sigint=True)
src.close()
print("exit:", rv, "RSS samples:", [f"{s:.0f}" for s in samples])
half = len(samples) // 2
if len(samples) >= 4 and min(samples[half:]) > max(samples[:half]) * 1.25:
    print("FAIL: RSS climbing")
    sys.exit(1)
print("soak OK")
