import os

import pytest

from tests.conftest import TESTDATA
from theora_tpu.headers import (
    pack_comment_header,
    pack_info_header,
    pack_setup_header,
    parse_comment_header,
    parse_info_header,
    parse_setup_header,
)
from theora_tpu.tpkt import read_tpkt

STREAM = os.path.join(TESTDATA, "clip64x48_k1_q48.tpkt")


@pytest.fixture(scope="module")
def pkts():
    return read_tpkt(STREAM)


def test_info_header_roundtrip(pkts):
    info = parse_info_header(pkts[0].data)
    assert info.frame_width == 64 and info.frame_height == 48
    assert pack_info_header(info) == pkts[0].data


def test_comment_header_roundtrip(pkts):
    c = parse_comment_header(pkts[1].data)
    assert c["vendor"].startswith(b"Xiph.Org libtheora")
    assert pack_comment_header(c["comments"], c["vendor"]) == pkts[1].data


def test_setup_header_roundtrip(pkts):
    setup = parse_setup_header(pkts[2].data)
    assert len(setup.codebooks) == 80
    codes = []
    for b in setup.codebooks:
        per = [None] * 32
        for t, p, n in b.codes:
            per[t] = (p, n)
        codes.append(per)
    assert pack_setup_header(setup.qinfo, codes) == pkts[2].data
