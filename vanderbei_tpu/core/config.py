"""Solver configuration.

One dataclass replaces the reference's three config layers (MPS header
keywords iolp.c:167-183, the generic param[] store iolp.c:270-277, and the
AMPL key=val options amplio.c:94-151).  Numeric-kernel knobs default to the
reference's constants, cited per field.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    method: str = "hsd"             # reference default METHOD (ipo/makefile:57)
    max_iter: int = 0               # 0 -> per-method default (see registry)
    verbose: int = 0

    # interior-point tolerances
    ipm_eps: float = 1.0e-6         # intpt.c:30 residual/gap stop
    hsd_eps: float = 1.0e-12        # hsd.c:24 / hsdls.c mu stop
    delta: float = 0.02             # intpt centering (intpt.c:110)
    step_factor: float = 0.9        # intpt step damping r (intpt.c:111)
    hsd_step_factor: float = 0.95   # hsd.c:259
    beta: float = 0.80              # hsdls neighborhood (hsdls.c:112)

    # KKT / linear-algebra knobs (ldlt.c:27-32)
    epssol: float = 1.0e-6
    epsdiag: float = 1.0e-14
    refine_tol: float = 1.0e-10     # iterative refinement target (ldlt.c:411)
    max_refine: int = 8
    # KKT factorization precision: "f64", "f32" (MXU-speed factor + f64
    # refinement), or "hybrid" (f32 until mu < hybrid_mu, then f64)
    factor_dtype: str = "f64"
    hybrid_mu: float = 1.0e-4

    # simplex tolerances (pd.c:38-42)
    eps: float = 1.0e-8             # EPS / EPS1 pivot tolerance
    eps2: float = 1.0e-12           # EPS2 perturbation floor
    eps3: float = 1.0e-10           # EPS3 mu optimality cutoff
    simplex_max_iter: int = 1_000_000   # pd.c:42
    refresh_every: int = 64         # dense B^-1 refresh cadence (replaces
                                    # the eta-file/bump refactor heuristic,
                                    # lueta.c:104-131)

    seed: int = 0                   # jax.random key for perturbations
                                    # (replaces drand48, pd.c:193-200)
    dtype: np.dtype = np.float64
    # free (l = -inf) variables: "reject" = reference parity (solve.c:79-87
    # returns status 3); "split" = x+ - x- column splitting, which actually
    # solves the netlib instances the reference gives up on
    free_vars: str = "reject"

    def with_(self, **kw) -> "SolverConfig":
        return dataclasses.replace(self, **kw)
