"""Unit tests for the relations data-structure layer: variable ordering,
LC algebra, LcMap round-trips, inlining, predicates.

Mirrors the reference inline unit tests (variable.rs:199-267,
lc_map.rs:471-569) plus LC merge-algebra properties.
"""

import random

import numpy as np
import pytest

from snark_tpu.fields import BLS12_381_FR, BN254_FR, Fp
from snark_tpu.relations import (
    ConstraintSystem,
    FieldInterner,
    LcMap,
    LinearCombination,
    PredicateConstraintSystem,
    SynthesisMode,
    new_ref,
)
from snark_tpu.relations import variable as V

FR = Fp(BLS12_381_FR)


def test_variable_ordering():
    """Kind dominates index in the packed ordering (variable.rs:199-267)."""
    rng = random.Random(0)
    kinds = [
        (V.KIND_ZERO, lambda i: V.ZERO),
        (V.KIND_ONE, lambda i: V.ONE),
        (V.KIND_INSTANCE, V.instance),
        (V.KIND_WITNESS, V.witness),
        (V.KIND_SYMBOLIC_LC, V.symbolic_lc),
    ]
    for k1, mk1 in kinds:
        payload = rng.getrandbits(32)
        this = mk1(payload)
        for k2, mk2 in kinds:
            other_same = mk2(payload)
            other_rand = mk2(rng.getrandbits(32))
            if k1 == k2:
                assert this == other_same
                if k1 in (V.KIND_ZERO, V.KIND_ONE):
                    assert this == other_rand
                else:
                    assert (this < other_rand) == (
                        V.payload(this) < V.payload(other_rand)
                    )
            elif k1 < k2:
                assert this < other_same and this < other_rand
            else:
                assert this > other_same and this > other_rand


def test_variable_index():
    assert V.variable_index(V.ONE, 10) == 0
    assert V.variable_index(V.instance(3), 10) == 3
    assert V.variable_index(V.witness(4), 10) == 14
    assert V.variable_index(V.symbolic_lc(1), 10) is None
    assert V.index(V.ZERO) is None
    assert V.lc_index(V.symbolic_lc(9)) == 9


def test_lc_compactify_and_merge():
    a, b, c = V.instance(1), V.witness(0), V.witness(1)
    lc = LinearCombination(FR, [(b, 5), (a, 2), (b, 3), (c, FR.p - 1)])
    lc.compactify()
    assert lc.terms == [(a, 2), (b, 8), (c, FR.p - 1)]

    lc1 = LinearCombination.from_terms(FR, [(1, a), (2, b)])
    lc2 = LinearCombination.from_terms(FR, [(3, b), (4, c)])
    s = lc1 + lc2
    assert s.terms == [(a, 1), (b, 5), (c, 4)]
    d = lc1 - lc2
    assert d.terms == [(a, 1), (b, FR.p - 1), (c, FR.p - 4)]
    scaled = lc1.add_scaled(10, lc2)
    assert scaled.terms == [(a, 1), (b, 32), (c, 40)]
    assert (-lc1).terms == [(a, FR.p - 1), (b, FR.p - 2)]
    assert (lc1 * 3).terms == [(a, 3), (b, 6)]


def test_lc_add_var_and_tuple():
    a, b = V.instance(1), V.witness(0)
    lc = LinearCombination.zero(FR) + a + (7, b)
    assert lc.terms == [(a, 1), (b, 7)]
    lc = lc + a
    assert lc.terms == [(a, 2), (b, 7)]
    # diff of equal vars is zero LC (ref diff_vars :105-111)
    assert LinearCombination.diff_vars(FR, a, a).is_empty()


def test_lc_map_roundtrip():
    interner = FieldInterner(FR)
    m = LcMap()
    lc1 = LinearCombination.from_terms(FR, [(1, V.instance(1)), (5, V.witness(0))])
    lc2 = LinearCombination.from_terms(FR, [(FR.p - 1, V.witness(2))])
    m.push(lc1, interner)
    m.push(lc2, interner)
    assert m.num_lcs() == 2
    assert m.total_lc_size() == 3
    vars_, cids = m.get(0)
    assert vars_ == [V.instance(1), V.witness(0)]
    assert [interner.value(c) for c in cids] == [1, 5]
    vars_, cids = m.get(1)
    assert [interner.value(c) for c in cids] == [FR.p - 1]
    # vectorized rewrite: instance(1) -> witness(9)
    arr = m.vars_array()
    arr = np.where(arr == np.uint64(V.instance(1)), np.uint64(V.witness(9)), arr)
    m.set_vars_from_array(arr)
    assert m.get(0)[0] == [V.witness(9), V.witness(0)]


def test_interner_fast_paths():
    interner = FieldInterner(FR)
    assert interner.get_or_intern(1) == 0
    assert interner.get_or_intern(FR.p - 1) == 1
    i5 = interner.get_or_intern(5)
    assert interner.get_or_intern(5) == i5
    assert interner.value(i5) == 5


def test_lc_canonicalization():
    cs = ConstraintSystem(FR)
    # empty LC -> symbolic_lc(0)
    assert cs.new_lc(cs.lc()) == V.symbolic_lc(0)
    # singleton coeff-1 -> passthrough
    w = cs.new_witness_variable(3)
    assert cs.new_lc(cs.lc(w)) == w
    # otherwise a fresh symbolic LC
    lc_var = cs.new_lc(cs.lc_terms((2, w)))
    assert V.is_lc(lc_var) and V.lc_index(lc_var) == 1


def test_inline_all_lcs():
    cs = ConstraintSystem(FR)
    a = cs.new_input_variable(2)
    b = cs.new_witness_variable(3)
    d = cs.new_lc(cs.lc(a, b))  # d = a + b
    e = cs.new_lc(cs.lc(d, d))  # e = 2d -> must inline to 2a + 2b
    cs.enforce_r1cs_constraint(cs.lc(V.ONE), cs.lc(e), cs.lc(e))
    cs.finalize()
    mats = cs.to_matrices()["R1CS"]
    assert mats[1] == [[(2, 1), (2, 2)]]
    assert cs.is_satisfied()


def test_setup_mode_skips_values():
    cs = ConstraintSystem(FR)
    cs.set_mode(SynthesisMode.setup())
    called = []

    def boom():
        called.append(1)
        return 1

    cs.new_input_variable(boom)
    cs.new_witness_variable(boom)
    assert not called  # value closures must NOT run in setup (ref :598)
    assert cs.num_instance_variables == 2
    assert cs.num_witness_variables == 1


def test_prove_no_matrices_mode():
    cs = ConstraintSystem(FR)
    cs.set_mode(SynthesisMode.prove(construct_matrices=False, generate_lc_assignments=False))
    a = cs.new_witness_variable(2)
    b = cs.new_witness_variable(3)
    c = cs.new_witness_variable(6)
    cs.enforce_r1cs_constraint(cs.lc(a), cs.lc(b), cs.lc(c))
    # matrices not constructed -> no predicate storage, LcMap only has LC0
    assert cs.lc_map.num_lcs() == 1
    assert cs.num_constraints() == 0
    assert cs.assignments.witness_assignment == [2, 3, 6]


def test_polynomial_predicate_eval():
    pred = PredicateConstraintSystem.new_polynomial_predicate_cs(
        FR, 3, [(1, [(0, 1), (1, 1)]), (FR.p - 1, [(2, 1)])]
    ).get_predicate()
    assert pred.is_satisfied([3, 5, 15])
    assert not pred.is_satisfied([3, 5, 14])
    assert pred.degree() == 2
    assert pred.arity == 3


def test_batch_csr_enforce():
    """General-LC batch path == per-constraint path."""
    for field in (Fp(BN254_FR), FR):
        cs1 = ConstraintSystem(field)
        w = [cs1.new_witness_variable(v) for v in (2, 3, 4)]
        cs1.enforce_r1cs_constraint(
            cs1.lc_terms((1, w[0]), (2, w[1])),  # 2+6=8
            cs1.lc(w[2]),
            cs1.lc_terms((8, w[2])),
        )
        # batch CSR equivalent
        cs2 = ConstraintSystem(field)
        w2 = cs2.new_witness_variables([2, 3, 4])
        a = (np.array([0, 2]), np.array([w2[0], w2[1]], dtype=np.uint64),
             cs2.intern_coeffs([1, 2]))
        b = (np.array([0, 1]), np.array([w2[2]], dtype=np.uint64),
             cs2.intern_coeffs([1]))
        c = (np.array([0, 1]), np.array([w2[2]], dtype=np.uint64),
             cs2.intern_coeffs([8]))
        cs2.enforce_constraints_batch_csr("R1CS", [a, b, c])
        assert cs1.to_matrices() == cs2.to_matrices()
        for cs in (cs1, cs2):
            cs.finalize()
            assert cs.is_satisfied()  # (1*2 + 2*3) * 4 == 8 * 4


def test_to_csr_matrices_roundtrip():
    """Device-handoff CSR equals to_matrices() (VERDICT r1 item 5: the
    __slots__ bug made every call raise; pin the repaired path)."""
    cs = ConstraintSystem(FR)
    x = cs.new_input_variable(3)
    w = [cs.new_witness_variable(v) for v in (2, 6, 36)]
    cs.enforce_r1cs_constraint(
        cs.lc_terms((1, x), (FR.p - 1, w[0])),  # (x - w0) * w1 = ...
        cs.lc(w[1]),
        cs.lc_terms((1, w[2]), (FR.p - 30, V.ONE)),
    )
    cs.finalize()
    dense = cs.to_matrices()
    csr = cs.to_csr_matrices()
    assert set(dense) == set(csr)
    z = cs.full_assignment()
    for label in dense:
        for mat_dense, mat_csr in zip(dense[label], csr[label]):
            assert mat_csr.interner is cs.field_interner
            from snark_tpu.relations.matrix import mat_vec_mul

            want = mat_vec_mul(mat_dense, z, FR.p)
            got = mat_csr.mat_vec_mul_ints(None, z)
            assert got == want
            # CSR structure mirrors the dense rows exactly
            assert mat_csr.num_rows == len(mat_dense)
            import numpy as np  # noqa: F811

            assert list(np.diff(mat_csr.row_ptr)) == [
                len(r) for r in mat_dense
            ]


def test_batch_enforce_no_matrices_counting():
    """Pinned: batch enforce in a non-matrix mode leaves num_constraints
    unchanged, exactly like the per-constraint path (constraint_system.py
    batch path comment; ref Prove{construct_matrices: false})."""
    for batch in (False, True):
        cs = ConstraintSystem(FR)
        cs.set_mode(
            SynthesisMode.prove(
                construct_matrices=False, generate_lc_assignments=False
            )
        )
        w = [cs.new_witness_variable(v) for v in (2, 3, 6)]
        if batch:
            cs.enforce_r1cs_constraints_batch_vars(
                np.array([w[0]], dtype=np.uint64),
                np.array([w[1]], dtype=np.uint64),
                np.array([w[2]], dtype=np.uint64),
            )
        else:
            cs.enforce_r1cs_constraint(cs.lc(w[0]), cs.lc(w[1]), cs.lc(w[2]))
        assert cs.num_constraints() == 0
        assert cs.lc_map.num_lcs() == 1  # only LC0
