"""Device affine codec == host packing, byte for byte.

rows_and_query (device Fermat inverse + canonical digit packing +
legacy-Mont limb regroup, ops/plane_affine.py) must reproduce exactly
what the r3 host tail produced: pack_rows_u8_host over the host affine
list, and pack_affine_host's u32 query arrays.
"""

import random

import numpy as np
import pytest

from snark_tpu.fields import BN254
from snark_tpu.ops.curve import get_g1_ops, get_g2_ops
from snark_tpu.ops.fixed_base_plane import PlaneFixedBase
from snark_tpu.ops.pallas_curve import get_plane_curve, pack_rows_u8_host


@pytest.mark.parametrize("group", ["g1", "g2"])
def test_rows_and_query_match_host_path(group):
    curve = BN254
    pc = get_plane_curve(curve)
    rng = random.Random(17)
    n = 24
    scalars = [rng.randrange(curve.fr.modulus) for _ in range(n - 2)] + [0, 1]
    fb = PlaneFixedBase(curve, group, chunk=32)

    affs = fb.affine(scalars)
    want_rows = pack_rows_u8_host(pc, affs, group)
    ops = get_g1_ops(curve) if group == "g1" else get_g2_ops(curve)
    want_query = np.asarray(ops.pack_affine_host(affs))

    rows, query = fb.rows_and_query(scalars)
    assert rows.shape == want_rows.shape
    assert (rows == want_rows).all()
    assert query.shape == want_query.shape
    assert (query == want_query).all()
