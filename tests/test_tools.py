"""Ogg container + CLI tool round trips."""
import os
import numpy as np

from tests.conftest import TESTDATA
from theora_tpu.ogg import demux_stream, mux_stream
from theora_tpu.tpkt import read_tpkt


def test_ogg_mux_demux_roundtrip():
    pkts = read_tpkt(os.path.join(TESTDATA, "clip64x48_k8_q20.tpkt"))
    ogg = mux_stream(pkts)
    back = demux_stream(ogg)
    assert len(back) == len(pkts)
    for a, b in zip(back, pkts):
        assert a.data == b.data


def test_ogg_large_packet_spanning_pages():
    from theora_tpu.tpkt import Packet

    big = Packet(bytes(range(256)) * 300, granulepos=7)  # 76800 bytes
    small = Packet(b"x" * 10, granulepos=8)
    ogg = mux_stream([big, small])
    # demux_stream filters for theora; use PageReader directly
    from theora_tpu.ogg import PageReader

    out = [p for _, p in PageReader(ogg).packets()]
    assert len(out) == 2
    assert out[0].data == big.data
    assert out[1].data == small.data
