"""Model-builder API (the AMPL front end's replacement) + checkpoint tests."""

import numpy as np
import pytest

import vanderbei_tpu as vt
from vanderbei_tpu.core.builder import LPBuilder
from vanderbei_tpu.core.status import Status
from vanderbei_tpu.utils.checkpoint import (
    save_solution, load_solution, save_state, load_state)


def diet_lp():
    lpb = LPBuilder(name="diet", maximize=False)
    lpb.var("x1", obj=2.0)
    lpb.var("x2", upper=4.0, obj=3.0)
    lpb.constraint("protein", {"x1": 1.0, "x2": 2.0}, lo=10.0)
    lpb.constraint("budget", {"x1": 3.0, "x2": 1.0}, hi=15.0)
    return lpb.build()


def test_builder_solves():
    lp = diet_lp()
    sol = vt.solve(lp, method="hsd")
    assert sol.status == int(Status.OPTIMAL)
    # min 2x1+3x2, x1+2x2>=10, 3x1+x2<=15, 0<=x2<=4: optimum at x2=4,
    # x1=2 -> obj 16
    assert sol.primal_obj == pytest.approx(16.0, abs=1e-6)
    np.testing.assert_allclose(sol.x, [2.0, 4.0], atol=1e-5)


def test_builder_range_and_equality():
    lpb = LPBuilder(maximize=True)
    lpb.var("a", obj=1.0)
    lpb.var("b", obj=1.0)
    lpb.constraint("eq", {"a": 1.0, "b": 1.0}, lo=3.0, hi=3.0)
    lpb.constraint("rng", {"a": 1.0, "b": -1.0}, lo=-1.0, hi=1.0)
    lp = lpb.build()
    sol = vt.solve(lp, method="pd")
    assert sol.status == int(Status.OPTIMAL)
    assert sol.primal_obj == pytest.approx(3.0, abs=1e-6)


def test_builder_quadratic():
    lpb = LPBuilder()
    lpb.var("x", obj=0.0)
    lpb.var("y", obj=0.0)
    lpb.quad("x", "x", 1.0)
    lpb.quad("y", "y", 1.0)
    lpb.constraint("c", {"x": 1.0, "y": 1.0}, lo=2.0)
    sol = vt.solve(lpb.build(), method="intpt")
    assert sol.status == int(Status.OPTIMAL)
    assert sol.primal_obj == pytest.approx(1.0, abs=1e-5)


def test_builder_errors():
    lpb = LPBuilder()
    lpb.var("x")
    with pytest.raises(ValueError):
        lpb.var("x")
    with pytest.raises(KeyError):
        lpb.constraint("c", {"nope": 1.0}, lo=0.0)
    with pytest.raises(ValueError):
        lpb.constraint("c", {"x": 1.0})


def test_solution_checkpoint_roundtrip(tmp_path):
    sol = vt.solve(diet_lp(), method="hsd")
    p = str(tmp_path / "sol.npz")
    save_solution(p, sol)
    back = load_solution(p)
    assert back.status == sol.status
    assert back.primal_obj == sol.primal_obj
    np.testing.assert_array_equal(back.x, sol.x)


def test_solver_state_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from vanderbei_tpu.models import hsd
    A = jnp.eye(4)
    s = hsd.init_state(A)
    p = str(tmp_path / "state.npz")
    save_state(p, s)
    back = load_state(p, hsd.HsdState)
    np.testing.assert_array_equal(np.asarray(back.x), np.asarray(s.x))
    assert back._fields == s._fields
