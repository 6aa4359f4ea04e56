"""Measure and commit the reference C ipo (hsd) single-core baseline.

Builds the reference binary out-of-tree (-O2, one CPU core) and times it
end-to-end per solvable netlib problem, recording returncode and reported
status so timeouts/crashes are bookkept honestly (advisor r3: counting a
timed-out run as 'solved' made the baseline-validity guard vacuous).

Writes bench_ref_times.json at the repo root — bench.py consumes it as
the committed vs_baseline denominator (machine-stable: same image, same
-O2 build; re-run this script to refresh).

    python scripts/time_reference_baseline.py
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BUILD = "/tmp/refbuild_baseline"
TIMEOUT_S = 3600.0


def build() -> str:
    src = "/root/reference/src"
    binary = os.path.join(BUILD, "ipo_hsd")
    if os.path.exists(binary):
        return binary
    os.makedirs(BUILD, exist_ok=True)
    subprocess.run(["cp", "-r", src, os.path.join(BUILD, "src")], check=True)
    common = ["main", "solve", "iolp", "hash", "cputime", "strdup",
              "hook", "tree", "heap", "linalg", "noamplio"]
    srcs = [os.path.join(BUILD, "src", "common", f"{c}.c") for c in common]
    srcs += [os.path.join(BUILD, "src", "ipo", f)
             for f in ("hsd.c", "ldlt.c")]
    subprocess.run(
        ["gcc", "-O2", "-w",
         "-I", os.path.join(BUILD, "src", "common"),
         "-I", os.path.join(BUILD, "src", "ipo")]
        + srcs + ["-lm", "-o", binary],
        check=True, capture_output=True)
    return binary


def main() -> int:
    import jax
    jax.config.update("jax_platforms", "cpu")
    from vanderbei_tpu.core.canonicalize import canonicalize
    from vanderbei_tpu.core.status import Status
    from vanderbei_tpu.io import netlib

    binary = build()
    out_path = os.path.join(REPO, "bench_ref_times.json")
    cache = {}
    if os.path.exists(out_path):
        with open(out_path) as fp:
            cache = json.load(fp)

    for name in netlib.available_problems():
        lp = netlib.load(name)
        canon = canonicalize(lp, pad_to=1)
        if canon.status != int(Status.RUNNING):
            continue        # free-variable instances: both sides abort
        if name in cache and cache[name].get("rc") == 0:
            continue
        path = os.path.join(netlib.netlib_dir(),
                            netlib.NETLIB_GOLDEN[name][0])
        t0 = time.perf_counter()
        try:
            proc = subprocess.run([binary, path], capture_output=True,
                                  timeout=TIMEOUT_S, cwd=BUILD, text=True)
            dt = time.perf_counter() - t0
            rc = proc.returncode
            last = (proc.stdout.strip().splitlines() or [""])[-1]
        except subprocess.TimeoutExpired:
            dt, rc, last = TIMEOUT_S, -9, "timeout"
        cache[name] = dict(seconds=round(dt, 3), rc=rc, status=last)
        print(f"{name:10s} {dt:8.2f}s rc={rc} {last}", flush=True)
        with open(out_path, "w") as fp:
            json.dump(cache, fp, indent=1, sort_keys=True)

    ok = [n for n, v in cache.items() if v["rc"] == 0]
    bad = {n: v for n, v in cache.items() if v["rc"] != 0}
    total = sum(v["seconds"] for v in cache.values())
    print(f"done: {len(ok)} solved, {len(bad)} failed/timeout "
          f"({sorted(bad)}), total {total:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
