"""Golden-matrix fixtures transcribed from the reference test suite.

Expected matrices are data transcribed from relations/src/gr1cs/tests/
circuit1.rs:28-61 and circuit2.rs:21-43 — THE bit-exactness oracle for
synthesis (SURVEY.md §4).
"""

import pytest

from snark_tpu.fields import BLS12_381_FR, Fp
from snark_tpu.models import Circuit1, Circuit2, DummyCircuit, MulChainCircuit
from snark_tpu.relations import (
    AssignmentMissing,
    ConstraintLayer,
    OptimizationGoal,
    R1CS_PREDICATE_LABEL,
    Sr1csAdapter,
    SynthesisMode,
    new_ref,
    r1cs_outliner,
)

FR = Fp(BLS12_381_FR)


def sat_circuit1():
    return Circuit1(
        x1=1, x2=2, x3=3, x4=0, x5=1255254,
        w1=4, w2=2, w3=5, w4=29, w5=28, w6=10, w7=57, w8=22022,
    )


def test_circuit1_sat():
    for goal in (None, OptimizationGoal.Constraints):
        cs = new_ref(FR)
        if goal is not None:
            cs.set_optimization_goal(goal)
        sat_circuit1().generate_constraints(cs)
        cs.finalize()
        assert cs.is_satisfied()


def test_circuit1_non_sat():
    c = sat_circuit1()
    c.x1 = 4  # flip one input (tests/mod.rs:48-76)
    cs = new_ref(FR)
    c.generate_constraints(cs)
    assert not cs.is_satisfied()


def circuit1_expected_matrices():
    one = 1
    return {
        R1CS_PREDICATE_LABEL: [[], [], []],
        "poly-predicate-A": [
            [[(one, 1)]],
            [[(one, 2)]],
            [[(one, 3)]],
            [[(one, 9)]],
        ],
        "poly-predicate-B": [
            [[(one, 4)], [(one, 10)]],
            [[(one, 6)], [(one, 11)]],
            [[(one, 10)], [(one, 13)]],
        ],
        "poly-predicate-C": [
            [[(one, 7)], [(one, 9), (one, 10)]],
            [[(one, 8)], [(one, 13)]],
            [[(one, 11)], [(one, 5)]],
        ],
    }


def test_circuit1_matrices():
    cs = new_ref(FR)
    Circuit1(*([0] * 13)).generate_constraints(cs)
    got = cs.to_matrices()
    assert got == circuit1_expected_matrices()
    # outlining after matrix extraction must not crash (tests/mod.rs:96-101)
    cs.set_instance_outliner(r1cs_outliner())
    cs.finalize()


def test_circuit1_instance_outlined():
    cs = new_ref(FR)
    Circuit1(*([0] * 13)).generate_constraints(cs)
    num_instance = cs.num_instance_variables
    prev_num_witness = cs.num_witness_variables
    cs.set_instance_outliner(r1cs_outliner())
    cs.finalize()
    # Δwitness == num_instance (tests/mod.rs:105-133)
    assert num_instance == cs.num_witness_variables - prev_num_witness
    # and the outlined system still satisfiable with real values
    cs2 = new_ref(FR)
    sat_circuit1().generate_constraints(cs2)
    cs2.set_instance_outliner(r1cs_outliner())
    cs2.finalize()
    assert cs2.is_satisfied()


def test_circuit2_matrices():
    cs = new_ref(FR)
    Circuit2(a=1, b=1, c=2).generate_constraints(cs)
    cs.finalize()
    one, two = 1, 2
    expected = {
        R1CS_PREDICATE_LABEL: [
            [[(one, 1)], [(one, 1)], [(one, 0)]],
            [
                [(two, 2)],
                [(one, 1), (one, 2)],
                [(two, 1), (two, 2)],
            ],
            [
                [(one, 3)],
                [(one, 1), (one, 2)],
                [(two, 1), (two, 2)],
            ],
        ],
    }
    assert cs.to_matrices() == expected
    assert cs.is_satisfied()


def test_dummy_circuit_sr1cs_roundtrip():
    cs = new_ref(FR)
    circuit = DummyCircuit(a=3, b=5, num_variables=128, num_constraints=128)
    circuit.generate_constraints(cs)
    assert cs.is_satisfied()
    new_cs = Sr1csAdapter.r1cs_to_sr1cs_with_assignment(cs.into_inner())
    assert new_cs.is_satisfied()
    # two square constraints per R1CS row + one binding per public column
    assert new_cs.num_constraints() >= 2 * cs.num_constraints()


def test_sr1cs_setup_mode():
    cs = new_ref(FR)
    cs.set_mode(SynthesisMode.setup())
    DummyCircuit(a=None, b=None, num_variables=16, num_constraints=8).generate_constraints(cs)
    new_cs = Sr1csAdapter.r1cs_to_sr1cs(cs)
    assert new_cs.num_constraints() > 0
    with pytest.raises(AssignmentMissing):
        cs.is_satisfied()


def test_mulchain_batch_equals_closure_path():
    n = 64
    cs_batch = new_ref(FR)
    MulChainCircuit(seed=7, n=n, batch=True).generate_constraints(cs_batch)
    cs_loop = new_ref(FR)
    MulChainCircuit(seed=7, n=n, batch=False).generate_constraints(cs_loop)
    for cs in (cs_batch, cs_loop):
        cs.finalize()
        assert cs.is_satisfied()
        assert cs.num_constraints() == n
    assert cs_batch.to_matrices() == cs_loop.to_matrices()
    assert cs_batch.full_assignment() == cs_loop.full_assignment()


def test_mulchain_non_sat_detects():
    cs = new_ref(FR)
    MulChainCircuit(seed=7, n=16, batch=True).generate_constraints(cs)
    cs.into_inner().assignments.witness_assignment[5] += 1
    cs.finalize()
    assert not cs.is_satisfied()
    which = cs.which_is_unsatisfied()
    assert which is not None


def test_trace_capture_on_unsat():
    c = sat_circuit1()
    c.x1 = 4
    with ConstraintLayer():
        cs = new_ref(FR)
        c.generate_constraints(cs)
        which = cs.which_is_unsatisfied()
    assert which is not None
    assert "Predicate A constraints" in which
