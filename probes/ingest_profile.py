"""Host-ingest chain attribution on THIS host (round-4 ask #4).

bench_ingest.py's host_pipeline number (~1.5 GS/s = 3 GB/s in r2) is the
full producer/consumer session chain with a null device step.  This
probe decomposes it into its memory passes so the committed conclusion
("memory-bus bound on a 1-core host" vs "framework overhead") is a
measurement, not a guess:

  memcpy       np.copyto of a 16 MB buffer          (the 1-core yard)
  read(shm)    plain os.pread of /dev/shm file      (page-cache copy)
  loader       native multi-reader loader acquire/release loop
  loader+view  + the u16 view / frame reshape the steps take (free?)
  slicer       FrameSlicer.push over pool-sized chunks (aligned path)
  chain        loader -> slicer -> null step call (no session machinery)

Run:  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python probes/ingest_profile.py
(Host-side only; platform choice just avoids touching the tunnel.)
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

MB = 1 << 20
FILE_MB = 512
CHUNK = 16 * MB


def rate(nbytes, dt):
    return nbytes / dt / 1e9


def main():
    path = "/dev/shm/rpf_ingest_probe.iq"
    rng = np.random.default_rng(0)
    blk = rng.integers(0, 256, MB, dtype=np.uint8).tobytes()
    with open(path, "wb") as f:
        for _ in range(FILE_MB):
            f.write(blk)

    # memcpy yard
    src = np.frombuffer(bytearray(blk * 16), dtype=np.uint8)
    dst = np.empty_like(src)
    np.copyto(dst, src)
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 1.0:
        np.copyto(dst, src)
        n += 1
    dt = time.perf_counter() - t0
    print(f"memcpy yard:      {rate(n * len(src), dt):6.2f} GB/s")

    # plain pread
    fd = os.open(path, os.O_RDONLY)
    buf = bytearray(CHUNK)
    t0 = time.perf_counter()
    total = 0
    for off in range(0, FILE_MB * MB, CHUNK):
        got = os.preadv(fd, [buf], off)
        total += got
    dt = time.perf_counter() - t0
    os.close(fd)
    print(f"pread /dev/shm:   {rate(total, dt):6.2f} GB/s")

    # native loader
    from rtl_power_fftw_tpu.native.binding import NativeLoader, native_available
    if not native_available():
        print("native loader unavailable", file=sys.stderr)
    else:
        for n_readers in (1, 4):
            ld = NativeLoader(CHUNK, 8)
            fd = os.open(path, os.O_RDONLY)
            ld.start_fd(fd, loop=False, readers=n_readers)
            t0 = time.perf_counter()
            total = 0
            while True:
                got = ld.acquire(timeout_ms=10000)
                if got is None:
                    break
                slot, arr = got
                total += arr.nbytes
                ld.release(slot)
                if ld.at_eof() and total >= FILE_MB * MB:
                    break
            dt = time.perf_counter() - t0
            ld.close()
            os.close(fd)
            print(f"native loader(r={n_readers}): {rate(total, dt):6.2f} GB/s")

    # slicer over aligned chunks (zero-copy views) + null consume
    from rtl_power_fftw_tpu.ops.spectral import FrameSlicer
    N = 2048
    slicer = FrameSlicer(N)
    data = np.frombuffer(blk * 16, dtype=np.uint8)  # 16 MB aligned-ish
    data = data[:len(data) - (len(data) % (2 * N))]
    t0 = time.perf_counter()
    n = 0
    passes = 0
    while time.perf_counter() - t0 < 1.0:
        frames = slicer.push(data)
        n += frames.nbytes
        passes += 1
        slicer.reset()
    dt = time.perf_counter() - t0
    print(f"FrameSlicer:      {rate(n, dt):6.2f} GB/s (aligned views)")

    # u16 view + per-step reshape (what the fused steps do per batch)
    F = 4096
    batch = np.frombuffer(blk * 16, dtype=np.uint8)[:F * 2 * N].reshape(F, 2 * N)
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 0.5:
        v = batch.view(np.uint16)
        n += v.nbytes
    dt = time.perf_counter() - t0
    print(f"u16 view:         {rate(2 * n, dt):6.2f} GB/s-equivalent (should be ~free)")

    os.unlink(path)


if __name__ == "__main__":
    main()
