"""Deliberately-broken circuit + trace-driven debugging — mirror of
relations/examples/non_satisfiable.rs: the same circuit as satisfiable.py
with a wrong public input, showing `which_is_unsatisfied` rendering the
captured namespace trace like a backtrace.

Run: python examples/non_satisfiable.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from snark_tpu.fields import BN254_FR, Fp
from snark_tpu.relations import ConstraintLayer, new_ref, ns
from snark_tpu.relations.gadgets import FpVar


def main():
    with ConstraintLayer():
        cs = new_ref(Fp(BN254_FR))
        with ns(cs, "inputs"):
            x = FpVar.new_input(cs, 3)
            y = FpVar.new_input(cs, 36)  # BUG: should be 35
        with ns(cs, "x^3 + x + 5 == y"):
            x3 = x.square() * x
            (x3 + x + FpVar.constant(cs, 5)).enforce_equal(y)

        cs.finalize()
        which = cs.which_is_unsatisfied()
        print("satisfied:", which is None)
        print("first unsatisfied constraint trace:")
        print(which)
        assert which is not None


if __name__ == "__main__":
    main()
