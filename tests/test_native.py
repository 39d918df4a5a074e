"""Differential tests: the C++ entropy tier must agree exactly with the
Python tier on real streams."""
import os

import numpy as np
import pytest

from tests.conftest import TESTDATA
from theora_tpu.decode.decoder import Decoder
from theora_tpu.headers import parse_info_header, parse_setup_header
from theora_tpu.tpkt import read_tpkt

pytest.importorskip("theora_tpu.native")
from theora_tpu.native import get_lib  # noqa: E402

if get_lib() is None:
    pytest.skip("native library unavailable", allow_module_level=True)


@pytest.mark.parametrize("name", ["clip64x48_k8_q20", "cif_cbr"])
def test_native_matches_python_decoder(name):
    pkts = read_tpkt(os.path.join(TESTDATA, f"{name}.tpkt"))
    info = parse_info_header(pkts[0].data)
    setup = parse_setup_header(pkts[2].data)
    dn = Decoder(info, setup, use_native=True)
    dp = Decoder(info, setup, use_native=False)
    assert dn._native is not None
    for p in pkts[3:]:
        dn.decode_packet(p.data)
        dp.decode_packet(p.data)
        for a, b in zip(dn.ycbcr_out(), dp.ycbcr_out()):
            assert np.array_equal(a, b)
