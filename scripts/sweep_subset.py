"""Crash-isolated, resumable sweep over an explicit problem subset.

Like scripts/sweep_driver.py but scoped to a --names list instead of the
full corpus, so a method can be swept over the slice it is expected to
handle (e.g. intpt over the small/mid tier) without burning wall on the
XL instances.  Poisoned-client crashes cost one row and the sweep
resumes; errored rows get one isolated per-process retry.

    python scripts/sweep_subset.py <method> <out> NAME [NAME ...] -- [extra args]
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
    method, out = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    if "--" in rest:
        cut = rest.index("--")
        names, extra = rest[:cut], rest[cut + 1:]
    else:
        names, extra = rest, []

    for attempt in range(8):
        recorded = {r["name"] for r in load_rows(out, method)}
        remaining = [n for n in names if n not in recorded]
        if not remaining:
            break
        cmd = [sys.executable, "-m", "vanderbei_tpu.evaluate",
               "--method", method, "--out", out, "--batch",
               "--names", *remaining] + extra
        print(f"[subset] attempt {attempt + 1}: {len(remaining)} problems",
              flush=True)
        try:
            rc = subprocess.run(
                cmd, cwd=REPO,
                timeout=float(os.environ.get("SWEEP_ATTEMPT_TIMEOUT",
                                             "3600"))).returncode
        except subprocess.TimeoutExpired:
            rc = -9
        print(f"[subset] attempt {attempt + 1} rc={rc}", flush=True)
        if rc == 0:
            break

    errored = [r["name"] for r in load_rows(out, method)
               if r["status"] < 0 and r["name"] in names]
    for name in errored:
        print(f"[subset] isolated retry: {name}", flush=True)
        try:
            subprocess.run([sys.executable, "-m", "vanderbei_tpu.evaluate",
                            "--method", method, "--out", out,
                            "--names", name] + extra,
                           cwd=REPO, timeout=900)
        except subprocess.TimeoutExpired:
            pass

    rows = [r for r in load_rows(out, method) if r["name"] in names]
    n_err = sum(1 for r in rows if r["status"] < 0)
    n_opt = sum(1 for r in rows if r["status"] == 0)
    print(f"[subset] done: {len(rows)} rows, {n_opt} optimal, "
          f"{n_err} error", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
