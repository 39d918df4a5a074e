import os

import numpy as np

from tests.conftest import TESTDATA
from theora_tpu import tables
from theora_tpu.constants import NAT_TO_ZIGZAG, ZIGZAG_TO_NAT
from theora_tpu.quant import dequant_tables_init, pp_dc_scale_init


def test_zigzag_inverse():
    assert np.array_equal(
        NAT_TO_ZIGZAG[ZIGZAG_TO_NAT[:64]], np.arange(64)
    )


def _check(name, qinfo):
    raw = open(os.path.join(TESTDATA, "vectors", name), "rb").read()
    ref = np.frombuffer(raw[: 64 * 3 * 2 * 64 * 2], dtype="<u2").reshape(
        64, 3, 2, 64
    )
    refpp = np.frombuffer(raw[64 * 3 * 2 * 64 * 2 :], dtype="<i4")
    assert np.array_equal(dequant_tables_init(qinfo), ref)
    assert np.array_equal(pp_dc_scale_init(qinfo), refpp)


def test_dequant_tables_default():
    _check("dequant_def.bin", tables.DEF_QUANT_INFO)


def test_dequant_tables_vp31():
    _check("dequant_vp31.bin", tables.VP31_QUANT_INFO)
