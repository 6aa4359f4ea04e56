"""Crash-isolated, resumable driver for the r4+ evaluate trees.

Runs the BATCHED corpus sweep (vanderbei_tpu.evaluate --batch) in a child
process; if the TPU worker dies (child exits 9 after recording the error
row), relaunches with the already-recorded problems skipped, so one crash
costs one row, not the tail of the sweep.  Problems that recorded an
error row get one final one-per-process retry (a fresh client usually
solves them — the r3 "crashes" were poisoned-client collateral).

    python scripts/sweep_driver.py hsd evaluate/r4 [extra evaluate args]
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_rows(out: str, method: str):
    p = os.path.join(REPO, out, "netlib", method, "records.json")
    if not os.path.exists(p):
        return []
    with open(p) as fp:
        return json.load(fp)


def main() -> int:
    method = sys.argv[1] if len(sys.argv) > 1 else "hsd"
    out = sys.argv[2] if len(sys.argv) > 2 else "evaluate/r4"
    extra = sys.argv[3:]

    sys.path.insert(0, REPO)
    from vanderbei_tpu.io import netlib
    all_names = netlib.available_problems()

    for attempt in range(8):
        recorded = {r["name"] for r in load_rows(out, method)}
        remaining = [n for n in all_names if n not in recorded]
        if not remaining:
            break
        cmd = [sys.executable, "-m", "vanderbei_tpu.evaluate",
               "--method", method, "--out", out, "--batch",
               "--names", *remaining] + extra
        print(f"[driver] attempt {attempt + 1}: {len(remaining)} problems",
              flush=True)
        # bounded wall per attempt: the r3 round left a sweep subprocess
        # (7200s chunk timeout > remaining round budget) alive PAST its
        # round, where it fought the next round's runs for the one chip —
        # the r4 root-cause finding (evaluate/r4/XL_CRASH_ROOTCAUSE.md)
        try:
            rc = subprocess.run(
                cmd, cwd=REPO,
                timeout=float(os.environ.get("SWEEP_ATTEMPT_TIMEOUT",
                                             "7200"))).returncode
        except subprocess.TimeoutExpired:
            rc = -9
        print(f"[driver] attempt {attempt + 1} rc={rc}", flush=True)
        if rc == 0:
            break

    # errored rows: one isolated retry each in a fresh process
    errored = [r["name"] for r in load_rows(out, method) if r["status"] < 0]
    for name in errored:
        print(f"[driver] isolated retry: {name}", flush=True)
        subprocess.run([sys.executable, "-m", "vanderbei_tpu.evaluate",
                        "--method", method, "--out", out, "--names", name]
                       + extra, cwd=REPO, timeout=3600)

    rows = load_rows(out, method)
    n_err = sum(1 for r in rows if r["status"] < 0)
    n_opt = sum(1 for r in rows if r["status"] == 0)
    print(f"[driver] done: {len(rows)} rows, {n_opt} optimal, "
          f"{n_err} error", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
