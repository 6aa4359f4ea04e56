"""Crash-isolated corpus sweep driver.

The remote TPU worker can die on rare compile/executable faults, poisoning
the owning process's JAX client and every subsequent solve (the round-2
evaluate tree lost its whole tail this way: one crash at GREENBEA turned 6
later problems into 0.1-second "error" rows).  This driver runs the
evaluate sweep in CHUNKED SUBPROCESSES — a crash costs only its chunk,
which is then retried one problem per process so only the true offender
records an error.

    python -m vanderbei_tpu.sweep --method hsd --out evaluate/r3

The child is `vanderbei_tpu.evaluate`, whose incremental README/records
writer merges each chunk into the results tree (evaluate.py:write_readme).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time


def run_chunk(names, method, out_dir, time_limit, extra, timeout_s):
    cmd = [sys.executable, "-m", "vanderbei_tpu.evaluate",
           "--method", method, "--names", *names]
    if out_dir:
        cmd += ["--out", out_dir]
    if time_limit:
        cmd += ["--time-limit", str(time_limit)]
    cmd += extra
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(cmd, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), timeout=timeout_s)
        rc = proc.returncode
    except subprocess.TimeoutExpired:
        rc = -9
    return rc, time.perf_counter() - t0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="vanderbei_tpu.sweep")
    p.add_argument("--method", default="hsd")
    p.add_argument("--out", default=None)
    p.add_argument("--names", nargs="*", default=None)
    p.add_argument("--chunk", type=int, default=8,
                   help="problems per subprocess")
    p.add_argument("--time-limit", type=float, default=None)
    p.add_argument("--timeout", type=float, default=3600.0,
                   help="hard wall per chunk subprocess")
    p.add_argument("--max-rows", type=int, default=None)
    p.add_argument("--max-cols", type=int, default=None)
    p.add_argument("--parallel", type=int, default=1,
                   help="concurrent chunk subprocesses: the remote XLA "
                   "compile service overlaps compiles across processes "
                   "(device execution still serializes on the one chip)")
    args, extra = p.parse_known_args(argv)

    from .io import netlib
    names = args.names or netlib.available_problems(
        max_rows=args.max_rows, max_cols=args.max_cols)

    chunks = [names[i:i + args.chunk]
              for i in range(0, len(names), args.chunk)]
    failed = []
    if args.parallel > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=args.parallel) as ex:
            futs = {ex.submit(run_chunk, chunk, args.method, args.out,
                              args.time_limit, extra, args.timeout): chunk
                    for chunk in chunks}
            for fut, chunk in futs.items():
                rc, secs = fut.result()
                print(f"[sweep] chunk rc={rc} ({secs:.0f}s): "
                      f"{' '.join(chunk)}", flush=True)
                if rc != 0:
                    failed.extend(chunk)
    else:
        for ci, chunk in enumerate(chunks):
            rc, secs = run_chunk(chunk, args.method, args.out,
                                 args.time_limit, extra, args.timeout)
            print(f"[sweep] chunk {ci + 1}/{len(chunks)} rc={rc} "
                  f"({secs:.0f}s): {' '.join(chunk)}", flush=True)
            if rc != 0:
                failed.extend(chunk)
    # crashed chunks: isolate the offender one problem per process
    for name in failed:
        rc, secs = run_chunk([name], args.method, args.out,
                             args.time_limit, extra, args.timeout)
        print(f"[sweep] retry {name} rc={rc} ({secs:.0f}s)", flush=True)

    # REPAIR PASS (r4 lesson: a poisoned client wrote 23 consecutive
    # error rows into the intpt tree inside an rc=0 chunk, and nothing
    # re-ran them).  Any error row in the merged records gets one fresh
    # single-problem process; a tree that stays majority-error FAILS the
    # sweep so a driver cannot commit it as if it were results.
    if args.out:
        import json
        rec_path = os.path.join(args.out, "netlib", args.method,
                                "records.json")
        err_rows = []
        if os.path.exists(rec_path):
            with open(rec_path) as fp:
                recs = json.load(fp)
            err_rows = [r["name"] for r in recs
                        if r["status"] < 0 and r["name"] in names]
        for name in err_rows:
            rc, secs = run_chunk([name], args.method, args.out,
                                 args.time_limit, extra, args.timeout)
            print(f"[sweep] repair {name} rc={rc} ({secs:.0f}s)",
                  flush=True)
        if os.path.exists(rec_path):
            with open(rec_path) as fp:
                recs = json.load(fp)
            still = [r["name"] for r in recs
                     if r["status"] < 0 and r["name"] in names]
            if len(still) > 0.5 * max(1, len(names)):
                print(f"[sweep] FAILED: {len(still)}/{len(names)} rows "
                      f"are error rows after repair — tree is NOT valid "
                      f"results: {' '.join(still[:10])}...", flush=True)
                return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
