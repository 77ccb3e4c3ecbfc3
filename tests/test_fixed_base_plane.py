"""Plane fixed-base MSM (setup path) vs the host oracle.

Covers ops/fixed_base_plane.py: the windowed-table fixed-base executor on
the fused mixed-add row kernel, the vectorized lazy-digit unpack, and the
Groth16 setup integration (plane and legacy paths must emit byte-identical
u8 MSM tables). Reference role: ark-ec FixedBase::msm as consumed by
ark-groth16's generator (SURVEY.md §2.3 "ark-ec").
"""

import random

import numpy as np
import pytest

from snark_tpu.fields import BN254
from snark_tpu.ops.curve_host import host_g1, host_g2
from snark_tpu.ops.fixed_base_plane import PlaneFixedBase, unpack_ints_np


@pytest.mark.parametrize("group", ["g1", "g2"])
def test_plane_fixed_base_matches_host(group):
    hc = host_g1(BN254) if group == "g1" else host_g2(BN254)
    fb = PlaneFixedBase(BN254, group, chunk=256)
    rng = random.Random(11)
    scalars = [0, 1, 2, BN254.fr.modulus - 1] + [
        rng.randrange(BN254.fr.modulus) for _ in range(6)
    ]
    affs = fb.affine(scalars)
    assert len(affs) == len(scalars)
    for s, a in zip(scalars, affs):
        exp = hc.scalar_mul(hc.generator, s)
        assert a == exp or (a is None and exp is None), s


def test_unpack_ints_np_matches_reference():
    fb = PlaneFixedBase(BN254, "g1", chunk=256)
    pf = fb.pc.pf
    rng = random.Random(3)
    vals = [rng.randrange(BN254.fq.modulus) for _ in range(5)]
    planes = pf.pack_np(vals).astype(np.float32)  # (R8, N) canonical
    assert unpack_ints_np(pf, planes) == pf.unpack_np(planes)
    assert unpack_ints_np(pf, planes) == vals
    # lazy form: digit values above 255 (value-preserving carry unfold)
    lazy = planes.copy()
    lazy[0] += 512.0
    lazy[1] -= 2.0
    assert unpack_ints_np(pf, lazy) == pf.unpack_np(lazy)


def test_setup_plane_vs_legacy_tables(monkeypatch):
    """Both setup fixed-base paths emit byte-identical u8 MSM tables."""
    from snark_tpu.groth16 import Groth16
    from snark_tpu.models import MulChainCircuit

    g16 = Groth16(BN254)
    circuit = MulChainCircuit(seed=3, n=2048 - 64, batch=True)
    # force the plane path for ALL five query vectors, including h (whose
    # perm'd table branch needs len >= the default 2048 threshold while
    # this domain yields 2047 h scalars — ADVICE r3)
    monkeypatch.setenv("SNARK_TPU_SETUP_PLANE_MIN", "256")
    monkeypatch.setenv("SNARK_TPU_SETUP_PLANE", "1")
    pk1, _ = g16.circuit_specific_setup(circuit, random.Random(42))
    monkeypatch.setenv("SNARK_TPU_SETUP_PLANE", "0")
    pk0, _ = g16.circuit_specific_setup(circuit, random.Random(42))
    for name in ("a_tbl", "b_g1_tbl", "b_g2_tbl", "h_tbl", "l_tbl"):
        t1 = np.asarray(getattr(pk1, name))
        t0 = np.asarray(getattr(pk0, name))
        assert t1.shape == t0.shape and (t1 == t0).all(), name


test_setup_plane_vs_legacy_tables = pytest.mark.slow(
    test_setup_plane_vs_legacy_tables
)
