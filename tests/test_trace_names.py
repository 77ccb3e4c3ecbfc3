"""constraint_names pretty-printer (constraint_system_ref.rs:528-577) and
trace rendering format."""

from snark_tpu.fields import BN254_FR, Fp
from snark_tpu.relations import ConstraintLayer, new_ref, ns


def test_constraint_names():
    with ConstraintLayer():
        cs = new_ref(Fp(BN254_FR))
        a = cs.new_witness_variable(2)
        b = cs.new_witness_variable(4)
        with ns(cs, "first-gadget"):
            cs.enforce_r1cs_constraint(cs.lc(a), cs.lc(a), cs.lc(b))
        with ns(cs, "outer"):
            with ns(cs, "inner"):
                cs.enforce_r1cs_constraint(cs.lc(a), cs.lc(a), cs.lc(b))
        names = cs.constraint_names()
        assert names is not None and len(names) == 2
        assert "first-gadget" in names[0]
        assert "outer" in names[1] and "inner" in names[1]


def test_names_without_layer():
    cs = new_ref(Fp(BN254_FR))
    a = cs.new_witness_variable(2)
    cs.enforce_r1cs_constraint(cs.lc(a), cs.lc(a), cs.lc())
    names = cs.constraint_names()
    # no ConstraintLayer installed -> label-index fallback
    assert names == ["R1CS - 0"]
