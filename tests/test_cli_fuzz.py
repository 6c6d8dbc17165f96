"""CLI robustness fuzz: random option soup must always produce either a
clean exit code from the ReturnValue contract or a successful run —
never a traceback. (The reference gets this via one catch-all in main,
rtl_power_fftw.cxx:227-230.)"""

import random

from rtl_power_fftw_tpu.cli import main


def run_cli(args):
    try:
        rv = main(args)
    except SystemExit as e:  # argparse help/version
        return e.code if e.code is not None else 0
    return rv


FLAG_POOL = [
    ["-b", "0"], ["-b", "2"], ["-b", "4096"], ["-b", "-3"], ["-b", "7"],
    ["-n", "0"], ["-n", "1"], ["-n", "100"], ["-n", "-1"],
    ["-t", "0.001"], ["-t", "1m2m"], ["-t", "abc"], ["-t", "1h2m3s"],
    ["-f", "100M"], ["-f", "1G:2G"], ["-f", "xyz"], ["-f", "5M:1M"],
    ["-f", "0"], ["-f", "100M:100M"],
    ["-r", "1000000"], ["-r", "0"], ["-r", "-5"],
    ["-g", "100"], ["-g", "-7"],
    ["-d", "0"], ["-d", "5"],
    ["-s", "12345"], ["-s", "16384"],
    ["--buffers", "1"], ["--buffers", "2"],
    ["-o", "25"], ["-o", "150"],
    ["-l"], ["-q"], ["-T"], ["-c"],
    ["-w", "/nonexistent"], ["-B", "/nonexistent"],
    ["--window-function", "hann"], ["--window-function", "nope"],
    ["--welch-overlap", "50"], ["--welch-overlap", "200"],
    ["--streams", "2"], ["--fft-backend", "matmul"],
    ["--fft-backend", "bluestein"],
    ["--shard-transform"], ["--record", "/tmp/fuzz_rec.iq"],
    ["--stitch-out", "/tmp/fuzz_stitch.dat"],
    ["--record", "/nonexistent-dir/x.iq"],
    ["--precision", "high"],
    ["--pfb-taps", "4"], ["--pfb-taps", "64"], ["--pfb-taps", "-1"],
    ["--multitaper", "4"], ["--multitaper", "40"],
    ["--time-bandwidth", "3"], ["--time-bandwidth", "999"],
    ["--sk-file", "/tmp/fuzz_sk.dat"], ["--sk-file", "/nonexistent-dir/s"],
    ["--sk-excise", "3"], ["--sk-excise", "-2"],
    ["--frames-per-step", "64"], ["--frames-per-step", "-8"],
    ["--stats-json", "/tmp/fuzz_stats.jsonl"],
    ["--source", "synthetic:noise=3"], ["--source", "bogus:"],
    ["--source", "synthetic:tone=zzz"],
    ["--source", "rtl_tcp:localhost:notaport"], ["--source", "file:"],
    ["--unknown-flag"],
]


def test_cli_fuzz_never_raises():
    rng = random.Random(1234)
    for trial in range(120):
        argv = []
        for _ in range(rng.randint(1, 5)):
            argv += rng.choice(FLAG_POOL)
        # Keep accidental successful runs quick.
        if "--source" in argv and "-n" not in argv and "-t" not in argv:
            argv += ["-n", "2", "-b", "64"]
        if "-c" in argv:
            argv.remove("-c")  # endless mode would hang the fuzz loop
        rv = run_cli(argv)
        assert isinstance(rv, int) and 0 <= rv <= 7, (argv, rv)
