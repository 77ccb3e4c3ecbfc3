"""BASELINE config 1: 2^10-constraint a*b=c chain over BN254 Fr —
synthesize + witness-satisfiability check on CPU (bit-exact semantics vs
ark-relations: same matrices shape/columns, same satisfiability verdict)."""

from snark_tpu.fields import BN254_FR, Fp
from snark_tpu.models import MulChainCircuit
from snark_tpu.relations import R1CS_PREDICATE_LABEL, new_ref


def test_config1_chain_2_10():
    n = 1 << 10
    cs = new_ref(Fp(BN254_FR))
    MulChainCircuit(seed=7, n=n, batch=True).generate_constraints(cs)
    cs.finalize()
    assert cs.num_constraints() == n
    assert cs.num_instance_variables == 2  # ONE + seed input
    assert cs.num_witness_variables == 2 * n
    assert cs.is_satisfied()

    # matrix structure: every row a single unit entry per argument, columns
    # inside [0, num_variables) — the CSR the device consumes
    mats = cs.to_matrices()[R1CS_PREDICATE_LABEL]
    ncols = cs.num_variables()
    for m in mats:
        assert len(m) == n
        for row in m:
            assert len(row) == 1
            coeff, col = row[0]
            assert coeff == 1 and 0 <= col < ncols

    # single witness corruption flips the verdict
    cs.into_inner().assignments.witness_assignment[n // 2] += 1
    assert not cs.is_satisfied()
