"""ConstraintSystemRef surface: None context, into_inner, cache_map,
metrics accessors (the count API, constraint_system.rs:146-235)."""

import pytest

from snark_tpu.fields import BN254_FR, Fp
from snark_tpu.relations import (
    ConstraintSystemRef,
    MissingCS,
    PredicateConstraintSystem,
    new_ref,
)


def test_none_context():
    none = ConstraintSystemRef.none()
    assert none.is_none()
    assert not none.is_in_setup_mode()
    assert none.into_inner() is None
    with pytest.raises(MissingCS):
        none.new_witness_variable(lambda: 1)
    # singleton
    assert ConstraintSystemRef.none() is none


def test_into_inner_and_cache_map():
    cs = new_ref(Fp(BN254_FR))
    inner = cs.into_inner()
    assert inner is not None
    # gadget memoization store (cache_map, constraint_system.rs:81)
    cs.cache_map["lookup-table"] = [1, 2, 3]
    assert cs.into_inner().cache_map["lookup-table"] == [1, 2, 3]


def test_metrics_accessors():
    f = Fp(BN254_FR)
    cs = new_ref(f)
    a = cs.new_witness_variable(2)
    cs.register_predicate(
        "SQ", PredicateConstraintSystem.new_sr1cs(f)
    )
    cs.enforce_r1cs_constraint(cs.lc(a), cs.lc(a), cs.lc())
    cs.enforce_constraint_arity_2("SQ", cs.lc(a), cs.lc(a))
    assert cs.num_predicates() == 2
    assert cs.num_constraints() == 2
    assert cs.get_all_predicates_num_constraints() == {"R1CS": 1, "SQ": 1}
    assert cs.get_all_predicate_arities() == {"R1CS": 3, "SQ": 2}
    assert cs.get_predicate_arity("R1CS") == 3
    assert cs.get_predicate_num_constraints("nope") is None
    types = cs.get_all_predicate_types()
    assert types["SQ"].arity == 2
    cs.remove_predicate("SQ")
    assert not cs.has_predicate("SQ")
    assert cs.num_predicates() == 1
