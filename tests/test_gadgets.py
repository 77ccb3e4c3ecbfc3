"""Gadget library: each gadget satisfiable with correct witnesses and
unsatisfiable with corrupted ones; setup-mode allocation matches prove-mode
shapes (the property Groth16 setup/prove depend on)."""

import pytest

from snark_tpu.fields import BN254_FR, Fp
from snark_tpu.relations import SynthesisMode, new_ref
from snark_tpu.relations.gadgets import FpVar

FR = Fp(BN254_FR)


def test_add_mul_square_inverse():
    cs = new_ref(FR)
    a = FpVar.new_witness(cs, 3)
    b = FpVar.new_witness(cs, 5)
    s = a + b
    m = a * b
    sq = a.square()
    inv = b.inverse()
    assert (s.value, m.value, sq.value) == (8, 15, 9)
    assert FR.mul(inv.value, 5) == 1
    cs.finalize()
    assert cs.is_satisfied()
    # corrupt one witness -> unsatisfiable
    cs.into_inner().assignments.witness_assignment[2] += 1  # s's slot
    assert not cs.is_satisfied()


def test_bool_select_iszero():
    cs = new_ref(FR)
    one = FpVar.new_witness(cs, 1)
    zero = FpVar.new_witness(cs, 0)
    one.enforce_bool()
    zero.enforce_bool()
    x = FpVar.new_witness(cs, 42)
    y = FpVar.new_witness(cs, 99)
    sel1 = x.select(one, y)
    sel0 = x.select(zero, y)
    assert sel1.value == 42 and sel0.value == 99
    z1 = zero.is_zero()
    z2 = x.is_zero()
    assert z1.value == 1 and z2.value == 0
    cs.finalize()
    assert cs.is_satisfied()


def test_bool_violation_detected():
    cs = new_ref(FR)
    two = FpVar.new_witness(cs, 2)
    two.enforce_bool()
    assert not cs.is_satisfied()


def test_to_bits():
    cs = new_ref(FR)
    x = FpVar.new_witness(cs, 0b101101)
    bits = x.to_bits(8)
    assert [b.value for b in bits] == [1, 0, 1, 1, 0, 1, 0, 0]
    cs.finalize()
    assert cs.is_satisfied()
    cs2 = new_ref(FR)
    y = FpVar.new_witness(cs2, 300)
    y.to_bits(8)  # 300 does not fit 8 bits -> packing fails
    assert not cs2.is_satisfied()


def test_setup_prove_shape_match():
    def build(cs, with_values):
        a = FpVar.new_witness(cs, 3 if with_values else None)
        b = FpVar.new_input(cs, 15 if with_values else None)
        m = a.square()
        c = m + a
        c.enforce_equal(FpVar.constant(cs, 12))
        (a * a).enforce_equal(FpVar.constant(cs, 9))

    cs_setup = new_ref(FR)
    cs_setup.set_mode(SynthesisMode.setup())
    build(cs_setup, False)
    cs_prove = new_ref(FR)
    build(cs_prove, True)
    assert cs_setup.num_constraints() == cs_prove.num_constraints()
    assert cs_setup.num_variables() == cs_prove.num_variables()
    cs_prove.finalize()
    assert cs_prove.is_satisfied()
