"""Netlib sweep harness: the evaluate/ results tree.

Reproduces the reference's quality-control artifact
(evaluate/v1-cf4d5ba/netlib/{ipo,simpo}/ — per-problem solution logs plus a
README.md summary table) for any registered method:

    python -m vanderbei_tpu.evaluate --method hsd --out evaluate/dev

Each problem gets NAME.mps.sol with the status line and final objectives;
README.md tabulates (rows, cols, nonzeros, objective-or-status) exactly like
the reference's per-solver README tables, diffable against both the
reference's tree and the canonical netlib optima.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

# persistent compilation cache: a full-corpus sweep compiles one executable
# per padded size class; re-runs (and bench.py, which shares the dir) hit it
_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)

from .core.config import SolverConfig
from .core.status import Status, status_message
from .io import netlib
from .models.registry import solve


def run_sweep(method: str = "hsd", out_dir: str | None = None,
              max_rows: int | None = 2000, max_cols: int | None = 2000,
              names: list[str] | None = None, config: SolverConfig | None = None,
              progress: bool = True, pad_to: int = 1):
    """Solve the netlib corpus; returns a list of per-problem records.

    pad_to > 1 rounds canonical dims up to tile multiples so problems of
    similar size share one compiled executable (the jit cache keys on padded
    shape), which is what makes a full-corpus sweep cheap on TPU.
    """
    if names is None:
        names = netlib.available_problems(max_rows=max_rows,
                                          max_cols=max_cols)
    cfg = config or SolverConfig()
    records = []
    for name in names:
        fname, rows, cols, nz, _flags, golden = netlib.NETLIB_GOLDEN[name]
        lp = netlib.load(name)
        t0 = time.perf_counter()
        try:
            sol = solve(lp, method=method, config=cfg, pad_to=pad_to)
            status = sol.status
            obj = sol.primal_obj
            iters = sol.iterations
        except Exception as e:      # record, don't abort the sweep
            status, obj, iters = -2, float("nan"), 0
            sol = None
            if progress:
                print(f"{name}: ERROR {e}")
        elapsed = time.perf_counter() - t0
        rel = (abs(obj - golden) / max(1.0, abs(golden))
               if status == int(Status.OPTIMAL) else float("inf"))
        rec = dict(name=name, rows=rows, cols=cols, nonzeros=nz,
                   status=int(status), objective=obj, golden=golden,
                   relerr=rel, iterations=int(iters),
                   seconds=round(elapsed, 3))
        records.append(rec)
        if progress:
            tag = ("ok" if rel < 1e-6 else
                   ("OBJ-MISMATCH" if status == int(Status.OPTIMAL)
                    else status_message(status) if status >= 0 else "error"))
            print(f"{name:10s} {method:8s} {tag:14s} obj={obj:.7e} "
                  f"iters={iters} {elapsed:.2f}s", flush=True)
        if out_dir:
            write_record(out_dir, method, rec)
    if out_dir:
        write_readme(out_dir, method, records)
    return records


def write_record(out_dir: str, method: str, rec: dict) -> None:
    d = os.path.join(out_dir, "netlib", method)
    os.makedirs(d, exist_ok=True)
    fname = netlib.NETLIB_GOLDEN[rec["name"]][0]
    with open(os.path.join(d, fname + ".sol"), "w") as fp:
        fp.write(f"m = {rec['rows']},n = {rec['cols']},nz = {rec['nonzeros']}\n")
        fp.write(f"iterations = {rec['iterations']}\n")
        fp.write(f"objective  = {rec['objective']:.7e}\n")
        fp.write(f"seconds    = {rec['seconds']}\n")
        if rec["status"] >= 0:
            fp.write(status_message(rec["status"]) + " \n")
        else:
            fp.write("error \n")


def write_readme(out_dir: str, method: str, records: list) -> None:
    d = os.path.join(out_dir, "netlib", method)
    os.makedirs(d, exist_ok=True)
    n_opt = sum(1 for r in records if r["status"] == int(Status.OPTIMAL))
    n_match = sum(1 for r in records if r["relerr"] < 1e-6)
    lines = [
        f"# netlib results — method `{method}`",
        "",
        f"{len(records)} problems; {n_opt} optimal; "
        f"{n_match} matching canonical optimum to 1e-6.",
        "",
        "| Name | Rows | Cols | Nonzeros | Objective | Status | Iters | Seconds |",
        "|------|-----:|-----:|---------:|----------:|--------|------:|--------:|",
    ]
    for r in records:
        obj = (f"{r['objective']:.7e}"
               if r["status"] == int(Status.OPTIMAL) else "—")
        st = (status_message(r["status"]) if r["status"] >= 0 else "error")
        lines.append(
            f"| {r['name']} | {r['rows']} | {r['cols']} | {r['nonzeros']} "
            f"| {obj} | {st} | {r['iterations']} | {r['seconds']} |")
    with open(os.path.join(d, "README.md"), "w") as fp:
        fp.write("\n".join(lines) + "\n")
    with open(os.path.join(d, "records.json"), "w") as fp:
        json.dump(records, fp, indent=1, default=float)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="vanderbei_tpu.evaluate")
    p.add_argument("--method", default="hsd")
    p.add_argument("--out", default=None)
    p.add_argument("--max-rows", type=int, default=2000)
    p.add_argument("--max-cols", type=int, default=2000)
    p.add_argument("--names", nargs="*", default=None)
    p.add_argument("--pad-to", type=int, default=1,
                   help="round padded canonical dims up to this multiple so "
                        "similar problems share one compiled executable")
    p.add_argument("--factor-dtype", default=None,
                   choices=("f64", "f32", "hybrid"))
    p.add_argument("--free-vars", default="split",
                   choices=("split", "reject"),
                   help="'split' solves the free-variable instances the "
                        "reference rejects; 'reject' is reference parity")
    args = p.parse_args(argv)
    cfg = SolverConfig(free_vars=args.free_vars)
    if args.factor_dtype:
        cfg = cfg.with_(factor_dtype=args.factor_dtype)
    run_sweep(method=args.method, out_dir=args.out, max_rows=args.max_rows,
              max_cols=args.max_cols, names=args.names,
              config=cfg, pad_to=args.pad_to)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
