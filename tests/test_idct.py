import os

import numpy as np

from tests.conftest import TESTDATA
from theora_tpu.ops.idct_np import idct8x8_batch

_REC = np.dtype([("x", "<i2", 64), ("zzi", "<i4"), ("y", "<i2", 64)])


def test_idct_bit_exact_vs_reference():
    raw = open(os.path.join(TESTDATA, "vectors", "idct_cases.bin"), "rb").read()
    cases = np.frombuffer(raw, dtype=_REC)
    x = cases["x"].reshape(-1, 8, 8).astype(np.int32)
    y = idct8x8_batch(x).reshape(-1, 64)
    assert np.array_equal(y, cases["y"].astype(np.int32))
