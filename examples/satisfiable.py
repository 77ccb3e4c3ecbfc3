"""Gadget-style circuit authoring with namespace tracing — satisfiable case.

Mirror of the reference example relations/examples/satisfiable.rs: helper
functions build sub-circuits inside named spans so constraint provenance is
recorded; the final system satisfies.

Run: python examples/satisfiable.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SNARK_TPU_TIMERS", "1")

from snark_tpu.fields import BN254_FR, Fp
from snark_tpu.relations import ConstraintLayer, new_ref, ns
from snark_tpu.relations.gadgets import FpVar


def cube_gadget(cs, x: FpVar) -> FpVar:
    """x^3 inside its own namespace."""
    with ns(cs, "cube"):
        x2 = x.square()
        return x2 * x


def range_gadget(cs, x: FpVar, bits: int):
    with ns(cs, "range-check"):
        x.to_bits(bits)


def main():
    with ConstraintLayer():
        cs = new_ref(Fp(BN254_FR))
        with ns(cs, "inputs"):
            x = FpVar.new_input(cs, 3)
            y = FpVar.new_input(cs, 35)
        with ns(cs, "x^3 + x + 5 == y"):
            x3 = cube_gadget(cs, x)
            lhs = x3 + x + FpVar.constant(cs, 5)
            lhs.enforce_equal(y)
        range_gadget(cs, x, 8)

        cs.finalize()
        print(f"constraints: {cs.num_constraints()}")
        print(f"variables:   {cs.num_variables()}")
        sat = cs.is_satisfied()
        print(f"satisfied:   {sat}")
        assert sat


if __name__ == "__main__":
    main()
