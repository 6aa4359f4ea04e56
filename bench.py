"""Benchmark: netlib sweep throughput vs the reference C solver.

Prints ONE JSON line:
    {"metric": "netlib_problems_per_min", "value": N, "unit": "problems/min",
     "vs_baseline": R, ...extras}

- Workload: every netlib instance whose canonical dense form fits in the
  benchmark size cap, solved to the reference's default HSD semantics
  (mu < 1e-12) with objectives cross-checked against the golden table.
- value: steady-state problems/min on this chip (compile excluded via a
  warmup pass per padded size class; a persistent compilation cache in
  .jax_cache makes warmup cheap on re-runs).
- vs_baseline: against the reference C ipo binary (hsd build, -O2, one CPU
  core) timed on the same problems on this host.  If the reference can't be
  built the stored constant from the last successful measurement is used.
"""

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import vanderbei_tpu as vt  # noqa: E402
from vanderbei_tpu.core.canonicalize import canonicalize  # noqa: E402
from vanderbei_tpu.core.status import Status  # noqa: E402
from vanderbei_tpu.io import netlib  # noqa: E402
from vanderbei_tpu.models import hsd  # noqa: E402

# benchmark subset: canonical dims capped so the dense path fits comfortably
MAX_DIM = 512
CLASS_GRAN = 128

# measured on this host (single core, gcc -O2 reference ipo/hsd build) the
# last time the reference was buildable; overridden by a live measurement.
FALLBACK_BASELINE_PROBLEMS_PER_MIN = None

REF_BUILD = "/tmp/refbuild_bench"


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def pick_problems():
    names = []
    # prefilter on published dims (canonical m <= rows + ranges + upper
    # bounds) before densifying anything
    for name in netlib.available_problems(max_rows=MAX_DIM,
                                          max_cols=MAX_DIM):
        lp = netlib.load(name)
        canon = canonicalize(lp, pad_to=1)
        if canon.status != int(Status.RUNNING):
            continue    # free-variable instances: reference aborts too
        if canon.m <= MAX_DIM and canon.n <= MAX_DIM:
            names.append((name, lp, canon))
    return names


def build_reference():
    src = "/root/reference/src"
    if not os.path.isdir(src):
        return None
    binary = os.path.join(REF_BUILD, "ipo_hsd")
    if os.path.exists(binary):
        return binary
    try:
        os.makedirs(REF_BUILD, exist_ok=True)
        subprocess.run(["cp", "-r", src, os.path.join(REF_BUILD, "src")],
                       check=True)
        common = ["main", "solve", "iolp", "hash", "cputime", "strdup",
                  "hook", "tree", "heap", "linalg", "noamplio"]
        srcs = [os.path.join(REF_BUILD, "src", "common", f"{c}.c")
                for c in common]
        srcs += [os.path.join(REF_BUILD, "src", "ipo", f)
                 for f in ("hsd.c", "ldlt.c")]
        subprocess.run(
            ["gcc", "-O2", "-w",
             "-I", os.path.join(REF_BUILD, "src", "common"),
             "-I", os.path.join(REF_BUILD, "src", "ipo")]
            + srcs + ["-lm", "-o", binary],
            check=True, capture_output=True)
        return binary
    except Exception:
        return None


def time_reference(binary, problems):
    """Single-core wall time of the reference ipo on the same MPS files."""
    total = 0.0
    solved = 0
    for name, lp, _ in problems:
        path = os.path.join(netlib.netlib_dir(),
                            netlib.NETLIB_GOLDEN[name][0])
        t0 = time.perf_counter()
        try:
            subprocess.run([binary, path], capture_output=True, timeout=600,
                           cwd=REF_BUILD)
            solved += 1
        except subprocess.TimeoutExpired:
            total += 600.0
            continue
        total += time.perf_counter() - t0
    return total, solved


def main():
    problems = pick_problems()
    if not problems:
        print(json.dumps({"metric": "netlib_problems_per_min", "value": 0.0,
                          "unit": "problems/min", "vs_baseline": 0.0,
                          "error": "no problems available"}))
        return

    # group into padded classes; each class is solved as ONE vmapped,
    # jitted while_loop (the TPU-first instance-batched sweep)
    classes = {}
    for name, lp, canon in problems:
        key = (_round_up(canon.m, CLASS_GRAN), _round_up(canon.n, CLASS_GRAN))
        classes.setdefault(key, []).append((name, lp, canon))

    from vanderbei_tpu.parallel.batch import solve_batch_hsd

    FACTOR_DTYPE = "hybrid"   # f32 MXU factor until mu < 1e-4, then f64

    def stack(entries, mp, np_):
        B = len(entries)
        A = np.zeros((B, mp, np_))
        b = np.ones((B, mp))
        c = np.zeros((B, np_))
        for k, (_, _, canon) in enumerate(entries):
            A[k, :canon.m, :canon.n] = canon.A[:canon.m, :canon.n]
            b[k, :canon.m] = canon.b[:canon.m]
            c[k, :canon.n] = canon.c[:canon.n]
        return A, b, c

    # per-rep VALUE perturbation: the remote-execution layer memoizes
    # launches by content, so re-timing identical data measures the cache,
    # not the chip.  A 1e-12-relative rhs jiggle leaves iteration counts
    # and 1e-6-checked objectives untouched but defeats the memo.
    N_REP = 2
    stacked = {k: stack(v, *k) for k, v in classes.items()}
    rng = np.random.default_rng(0)

    def rep_buffers(r):
        out = {}
        for k, (A, b, c) in stacked.items():
            bj = b * (1.0 + 1e-12 * r * rng.uniform(0.5, 1.0, b.shape))
            out[k] = (jnp.asarray(A), jnp.asarray(bj), jnp.asarray(c))
        return out

    reps = [rep_buffers(r) for r in range(1 + N_REP)]

    def sweep_once(buffers):
        out = {}
        for key, (A, b, c) in buffers.items():
            st, x, y, w, z, it = solve_batch_hsd(
                A, b, c, factor_dtype=FACTOR_DTYPE)
            out[key] = (st, x, it)
        # block on everything
        for key in out:
            jax.block_until_ready(out[key][1])
        return out

    # warmup: one compile per class
    t_compile0 = time.perf_counter()
    sweep_once(reps[0])
    compile_s = time.perf_counter() - t_compile0

    # timed sweeps on fresh buffers
    elapsed = float("inf")
    for r in range(1, 1 + N_REP):
        t0 = time.perf_counter()
        results = sweep_once(reps[r])
        elapsed = min(elapsed, time.perf_counter() - t0)
    ppm = 60.0 * len(problems) / elapsed

    solved = 0
    correct = 0
    for key, entries in classes.items():
        st, x, it = results[key]
        A, b, cc = stacked[key]
        st = np.asarray(st)
        for k, (name, _, canon) in enumerate(entries):
            if st[k] == int(Status.OPTIMAL):
                solved += 1
                sign = 1.0 if canon.maximize else -1.0
                obj = sign * (float(np.asarray(cc[k]) @ np.asarray(x[k]))
                              + canon.f)
                golden = netlib.golden_objective(name)
                if abs(obj - golden) / max(1.0, abs(golden)) < 1e-6:
                    correct += 1

    # baseline: reference C single-core on the same set
    vs_baseline = 0.0
    base_ppm = None
    binary = build_reference()
    if binary:
        ref_total, ref_count = time_reference(binary, problems)
        if ref_total > 0 and ref_count == len(problems):
            base_ppm = 60.0 * ref_count / ref_total
    if base_ppm is None:
        base_ppm = FALLBACK_BASELINE_PROBLEMS_PER_MIN
    if base_ppm:
        vs_baseline = ppm / base_ppm

    print(json.dumps({
        "metric": "netlib_problems_per_min",
        "value": round(ppm, 3),
        "unit": "problems/min",
        "vs_baseline": round(vs_baseline, 3),
        "n_problems": len(problems),
        "optimal": solved,
        "objective_match_1e6": correct,
        "elapsed_s": round(elapsed, 2),
        "compile_warmup_s": round(compile_s, 2),
        "baseline_problems_per_min": round(base_ppm, 3) if base_ppm else None,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
