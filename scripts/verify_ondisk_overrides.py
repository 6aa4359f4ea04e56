"""Independent verification of io/netlib_golden.ONDISK_OVERRIDES.

Some on-disk netlib MPS files are later revisions than the published
optimum table (problems/netlib/README.md:40-150); for those, evaluate.py
and bench.py score correctness against an override verified with an
INDEPENDENT solver.  This script reproduces that verification with scipy's
HiGHS on the exact on-disk files and writes
scripts/ondisk_overrides_verification.json — the committed evidence the
overrides rest on (advisor r3: the HiGHS check was only asserted in a
comment).

Run:  python scripts/verify_ondisk_overrides.py
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scipy.optimize import linprog
from scipy.sparse import csc_matrix

from vanderbei_tpu.io import netlib
from vanderbei_tpu.io.netlib_golden import ONDISK_OVERRIDES, NETLIB_GOLDEN


def solve_highs(name: str) -> dict:
    lp = netlib.load(name)
    A = csc_matrix((lp.A, lp.iA, lp.kA), shape=(lp.m, lp.n))
    # rows: b <= Ax <= b + r (lp.h:34-117 range semantics; L-rows already
    # negated by the reader); equality rows have r == 0
    r = np.where(np.isfinite(lp.r), lp.r, np.inf)
    lb_row = lp.b
    ub_row = lp.b + r
    c = lp.c if not lp.maximize else -lp.c
    res = _solve_two_sided(c, A, lb_row, ub_row, lp)
    obj = res["obj"] * (-1.0 if lp.maximize else 1.0) + lp.f
    return dict(status=res["status"], objective=obj)


def _solve_two_sided(c, A, lb_row, ub_row, lp):
    # scipy.linprog has no two-sided row API; split into <= pairs
    import scipy.sparse as sp
    rows_ub, rhs_ub = [], []
    rows_eq, rhs_eq = [], []
    Acsr = A.tocsr()
    for i in range(lp.m):
        lo, hi = lb_row[i], ub_row[i]
        if hi == lo:
            rows_eq.append(Acsr.getrow(i)); rhs_eq.append(lo)
        else:
            if np.isfinite(hi):
                rows_ub.append(Acsr.getrow(i)); rhs_ub.append(hi)
            if np.isfinite(lo):
                rows_ub.append(-Acsr.getrow(i)); rhs_ub.append(-lo)
    A_ub = sp.vstack(rows_ub) if rows_ub else None
    A_eq = sp.vstack(rows_eq) if rows_eq else None
    res = linprog(c, A_ub=A_ub, b_ub=np.array(rhs_ub) if rhs_ub else None,
                  A_eq=A_eq, b_eq=np.array(rhs_eq) if rhs_eq else None,
                  bounds=list(zip(lp.l, lp.u)), method="highs")
    return dict(status=("optimal" if res.status == 0 else f"status{res.status}"),
                obj=float(res.fun) if res.fun is not None else float("nan"))


def main():
    out = {}
    for name, override in sorted(ONDISK_OVERRIDES.items()):
        table = NETLIB_GOLDEN[name][5]
        r = solve_highs(name)
        rel = abs(r["objective"] - override) / max(1.0, abs(override))
        out[name] = dict(
            mps_file=NETLIB_GOLDEN[name][0],
            published_table=table,
            override=override,
            highs_objective=r["objective"],
            highs_status=r["status"],
            override_vs_highs_relerr=rel,
            verified=bool(r["status"] == "optimal" and rel < 1e-7),
        )
        print(f"{name}: table={table} override={override} "
              f"highs={r['objective']:.10g} ({r['status']}) relerr={rel:.2e}")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ondisk_overrides_verification.json")
    with open(path, "w") as fp:
        json.dump(out, fp, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
