"""Endurance soak: >= 1 h endless multi-hop matrix-mode session on the
LIVE TPU against a PACED rtl_tcp stream (round-5 ask #7).

The reference's defining use is unattended multi-hour scanning
(/root/reference/doc/rtl_power_fftw.1.md:107-120). This drives the real
CLI surface end-to-end for an hour:

  rtl_tcp source (tests/rtl_tcp_server.py --rate = the device rate,
  socket backpressure = a real dongle's pacing) -> endless -c session,
  3-hop scan, hann window at 2048 bins (the round-5 fourstep4x band),
  matrix mode (.bin append + per-pass .met refresh) -> SIGINT once at
  the deadline (FinishPass escalation) -> exit 0.

Monitored once a minute: RSS (must plateau — second-half slope vs
first-half), .bin growth, .met refresh mtime. Validated at the end:
exit code 0, .bin size == rows*N*4 with rows consistent with .met,
.met row/col counts parse, stderr shows clean queue histograms (first
bucket nonzero means the consumer kept up — with a paced source the
device always waits on the producer).

Usage:  python probes/soak_tpu.py [seconds [out_prefix]]
(defaults 3720, /tmp/soak_tpu). The child session inherits this
process's env, so a CPU CONTROL run — for attributing any RSS drift
between the framework and the axon TPU client — is
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python probes/soak_tpu.py 900 /tmp/soak_cpu
"""
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

DUR = int(sys.argv[1]) if len(sys.argv) > 1 else 3720
RATE = 2_048_000 * 2            # bytes/s at the default 2.048 MS/s
N = 2048
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/soak_tpu"


def rss_mb(pid):
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024
    except OSError:
        pass
    return 0.0


def main():
    for suf in (".bin", ".met"):
        try:
            os.remove(OUT + suf)
        except FileNotFoundError:
            pass
    portfile = OUT + ".port"
    try:
        os.remove(portfile)
    except FileNotFoundError:
        pass
    srv = subprocess.Popen(
        [sys.executable, "tests/rtl_tcp_server.py", portfile,
         "--bytes", str(RATE * (DUR + 600)), "--rate", str(RATE),
         "--accepts", "4", "--seed", "11"],
        cwd="/root/repo", stderr=subprocess.DEVNULL)
    for _ in range(100):
        if os.path.exists(portfile):
            break
        time.sleep(0.1)
    port = open(portfile).read().strip()

    err = open(OUT + ".err", "wb")
    out = open(OUT + ".sout", "wb")
    cli = subprocess.Popen(
        [sys.executable, "-m", "rtl_power_fftw_tpu",
         "-f", "100M:104M", "-b", str(N), "-n", "200", "-c",
         "--window-function", "hann", "-m", OUT,
         "--source", f"rtl_tcp:127.0.0.1:{port}"],
        cwd="/root/repo", stdout=out, stderr=err)

    t0 = time.time()
    rss, bins, mets = [], [], []
    while time.time() - t0 < DUR:
        time.sleep(60)
        if cli.poll() is not None:
            print(f"FAIL: session exited early rc={cli.returncode}",
                  flush=True)
            break
        r = rss_mb(cli.pid)
        b = (os.path.getsize(OUT + ".bin")
             if os.path.exists(OUT + ".bin") else 0)
        m = (os.path.getmtime(OUT + ".met")
             if os.path.exists(OUT + ".met") else 0.0)
        rss.append(r)
        bins.append(b)
        mets.append(m)
        print(f"t={time.time()-t0:5.0f}s RSS={r:7.1f}MB "
              f".bin={b/1e6:8.2f}MB .met_age={time.time()-m:6.0f}s"
              if m else f"t={time.time()-t0:5.0f}s RSS={r:7.1f}MB "
              f".bin={b/1e6:8.2f}MB .met absent", flush=True)

    if cli.poll() is None:
        print("sending SIGINT (FinishPass)...", flush=True)
        cli.send_signal(signal.SIGINT)
        try:
            rc = cli.wait(timeout=600)
        except subprocess.TimeoutExpired:
            print("FAIL: no exit within 600 s of SIGINT; escalating",
                  flush=True)
            cli.send_signal(signal.SIGINT)
            rc = cli.wait(timeout=120)
    else:
        rc = cli.returncode
    srv.terminate()
    err.close()
    out.close()

    # ---- verdicts -----------------------------------------------------
    print(f"exit={rc}", flush=True)
    h = len(rss) // 2
    if h >= 2:
        first, second = rss[:h], rss[h:]
        drift = (sum(second) / len(second)) - (sum(first) / len(first))
        print(f"RSS halves: {sum(first)/len(first):.1f} -> "
              f"{sum(second)/len(second):.1f} MB (drift {drift:+.1f})",
              flush=True)
    grew = all(b2 >= b1 for b1, b2 in zip(bins, bins[1:]))
    met_fresh = all(m > 0 for m in mets[2:])
    print(f".bin monotone append: {grew}; .met present+refreshed: "
          f"{met_fresh}", flush=True)
    size = os.path.getsize(OUT + ".bin")
    rows = size // (N * 4)
    print(f".bin {size} bytes = {rows} rows x {N} bins x f32 "
          f"(remainder {size % (N*4)})", flush=True)
    met = open(OUT + ".met").read()
    print("--- .met ---", flush=True)
    print(met, flush=True)
    hist = [ln for ln in open(OUT + ".err", "rb").read()
            .decode("utf-8", "replace").splitlines()
            if "queue" in ln.lower()][-3:]
    print("--- last queue histograms ---", flush=True)
    for ln in hist:
        print(ln, flush=True)


if __name__ == "__main__":
    main()
