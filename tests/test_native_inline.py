"""Native C++ LC-inlining engine vs the pure-Python pass: identical output
CSR on randomized systems with deep symbolic-LC nesting."""

import random

import numpy as np
import pytest

from snark_tpu.fields import BLS12_381_FR, BN254_FR, Fp
from snark_tpu.relations import ConstraintSystem, new_ref
from snark_tpu.relations.native import get_inliner


def build_nested_system(field, seed, n_lcs=60):
    """System where later LCs reference earlier symbolic LCs (the inlining
    workload), plus constraints so the map is populated realistically."""
    rng = random.Random(seed)
    cs = ConstraintSystem(field)
    w = [cs.new_witness_variable(rng.randrange(field.p)) for _ in range(16)]
    handles = []
    for i in range(n_lcs):
        terms = []
        for _ in range(rng.randrange(1, 5)):
            terms.append((rng.randrange(1, field.p), w[rng.randrange(16)]))
        if handles and rng.random() < 0.6:
            for _ in range(rng.randrange(1, 3)):
                terms.append(
                    (rng.randrange(1, field.p),
                     handles[rng.randrange(len(handles))])
                )
        lc = cs.lc_terms(*terms)
        h = cs.new_lc(lc)
        handles.append(h)
        if rng.random() < 0.5:
            cs.enforce_r1cs_constraint(cs.lc(h), cs.lc(w[0]), cs.lc(w[1]))
    return cs


@pytest.mark.parametrize("params", [BN254_FR, BLS12_381_FR], ids=lambda p: p.name)
def test_native_matches_python(params):
    field = Fp(params)
    inliner = get_inliner(field.p)
    if inliner is None:
        pytest.skip("native toolchain unavailable")

    cs_py = build_nested_system(field, seed=9)
    cs_nat = build_nested_system(field, seed=9)

    # python reference pass (native path disabled)
    import snark_tpu.relations.constraint_system as csmod

    orig = csmod.ConstraintSystem._inline_all_lcs_native
    csmod.ConstraintSystem._inline_all_lcs_native = lambda self: False
    try:
        cs_py.inline_all_lcs()
    finally:
        csmod.ConstraintSystem._inline_all_lcs_native = orig

    # native pass (direct, no threshold)
    lm = cs_nat.lc_map
    out_off, out_vars, out_vals = inliner.inline(
        lm.offsets_array(), lm.vars_array(), lm.coeff_ids_array(),
        cs_nat.field_interner.values,
    )

    # compare CSRs term by term
    py = cs_py.lc_map
    vals_py = [cs_py.field_interner.values[c] for c in py.coeff_ids]
    assert list(out_off) == py.offsets
    assert [int(v) for v in out_vars] == py.vars
    assert out_vals == vals_py


def test_native_through_finalize():
    """End-to-end: a big-enough system routes through the native pass inside
    finalize() and stays satisfiable with identical matrices."""
    field = Fp(BN254_FR)
    rng = random.Random(3)

    def build():
        cs = new_ref(field)
        a = cs.new_input_variable(2)
        b = cs.new_witness_variable(3)
        prev = cs.new_lc(cs.lc(a, b))  # a + b
        for i in range(1200):  # push nnz over the native threshold
            prev = cs.new_lc(
                cs.lc_terms((2, prev), (i + 1, b))
            )
        # constraint: 1 * prev = prev
        cs.enforce_r1cs_constraint(cs.lc(V_ONE), cs.lc(prev), cs.lc(prev))
        return cs

    from snark_tpu.relations import variable as V

    global V_ONE
    V_ONE = V.ONE
    cs1 = build()
    cs2 = build()
    import snark_tpu.relations.constraint_system as csmod

    orig = csmod.ConstraintSystem._inline_all_lcs_native
    csmod.ConstraintSystem._inline_all_lcs_native = lambda self: False
    try:
        cs1.finalize()  # python
    finally:
        csmod.ConstraintSystem._inline_all_lcs_native = orig
    cs2.finalize()  # native (threshold exceeded)
    assert cs1.to_matrices() == cs2.to_matrices()
    assert cs1.is_satisfied() and cs2.is_satisfied()


def test_native_synthesizer_layout():
    """Native random-LC synthesis: layout + field invariants + inliner
    round-trip (the bench.rs workload in C++; VERDICT r1 item 8)."""
    import numpy as np

    from snark_tpu.fields import BLS12_381_FR
    from snark_tpu.relations.native import (
        NativeInliner,
        NativeSynthesizer,
        _from_u64x4,
    )

    p = BLS12_381_FR.modulus
    try:
        ns = NativeSynthesizer(p)
    except RuntimeError:
        import pytest

        pytest.skip("native engine unavailable")
    n = 500
    off, vars_, cids, vals, argv = ns.synthesize(n, 10, seed=3, num_vars=128)
    assert len(argv) == 3 * n
    assert off[0] == 0 and off[-1] == len(vars_) == len(cids)
    vv = _from_u64x4(vals)
    assert all(0 < v < p for v in vv)
    assert len(set(vv)) == len(vv)  # interner dedup
    assert ((vars_ >> np.uint64(61)) == 3).all()  # witness handles
    # ids reference the table (offset by id_base=2 for pre-interned 1, -1)
    assert cids.min() >= 2 and cids.max() < 2 + len(vv)
    ni = NativeInliner(p)
    pre = np.zeros((2, 4), dtype=np.uint64)
    pre[0, 0] = 1
    for i in range(4):
        pre[1, i] = ((p - 1) >> (64 * i)) & 0xFFFFFFFFFFFFFFFF
    o2, v2, c2 = ni.inline_raw(off, vars_, cids, np.concatenate([pre, vals]))
    # no symbolic-LC refs in the input -> inlining is an identity modulo
    # compactify (sort + merge)
    assert len(o2) == len(off)
    assert o2[-1] <= off[-1]


def test_native_eval_rows():
    """lc_eval_rows (batched sparse dot vs an assignment) matches the
    Python oracle — the witness-solving hot loop at scale (VERDICT r2
    item 10; mirrors assignment.rs:40-52)."""
    import numpy as np

    from snark_tpu.fields import BN254_FR
    from snark_tpu.relations.native import get_evaluator, _to_u64x4, _from_u64x4

    p = BN254_FR.modulus
    ev = get_evaluator(p)
    if ev is None:
        import pytest

        pytest.skip("native engine unavailable")
    rng = random.Random(3)
    num_cols = 20
    assignment = [rng.randrange(0, p) for _ in range(num_cols)]
    values = [1, p - 1] + [rng.randrange(0, p) for _ in range(6)]
    rows = []
    for _ in range(12):
        k = rng.randrange(0, 6)
        rows.append(
            [(rng.randrange(0, len(values)), rng.randrange(-1, num_cols))
             for _ in range(k)]
        )
    offsets = np.zeros(len(rows) + 1, dtype=np.int64)
    cid, col = [], []
    for i, row in enumerate(rows):
        for c_id, c_col in row:
            cid.append(c_id)
            col.append(c_col)
        offsets[i + 1] = len(cid)
    out = ev.eval_rows(
        offsets,
        np.zeros(len(cid), dtype=np.uint64),
        np.asarray(cid, dtype=np.uint32),
        _to_u64x4(values),
        _to_u64x4(assignment),
        np.asarray(col, dtype=np.int64),
    )
    got = _from_u64x4(out)
    expect = [
        sum(values[c_id] * (assignment[c_col] if c_col >= 0 else 0)
            for c_id, c_col in row) % p
        for row in rows
    ]
    assert got == expect
