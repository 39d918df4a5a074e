"""Adversarial Ogg container corpus.

In-the-wild Theora files differ from our own muxer's output at the
CONTAINER level: packets spanning many pages, multiplexed secondary
streams (skeleton/CMML/vorbis), junk between pages, corrupted pages,
false capture patterns inside bodies, zero-length (dup) packets, and
chained physical streams.  This environment has no egress and no other
Theora muxer (no ffmpeg/libav in the image), so those layouts are
synthesized here directly -- every legal variation must demux to the
SAME packet bytes and decode bit-identically; the lossy variations
(dropped pages) must resync per libogg semantics.

Spec: the Ogg framing rules of doc/spec/spec.tex ch. 7 context /
RFC 3533 (page structure, lacing, continuation, CRC resync).
"""
import os
import struct
import subprocess

import numpy as np
import pytest

from tests.conftest import REPO_ROOT, TESTDATA, ensure_ref_oracle
from theora_tpu.decode.decoder import Decoder
from theora_tpu.encode.encoder import Encoder
from theora_tpu.headers import parse_info_header, parse_setup_header
from theora_tpu.info import TheoraInfo
from theora_tpu.ogg import PageWriter, demux_stream, mux_stream, _crc
from theora_tpu.tpkt import Packet, write_tpkt


def _encode_clip(ndup=1):
    W, H = 64, 48
    raw = np.fromfile(os.path.join(TESTDATA, "clip64x48.i420"), np.uint8)
    fsz = W * H * 3 // 2
    frames = []
    for i in range(min(6, len(raw) // fsz)):
        fr = raw[i * fsz : (i + 1) * fsz]
        frames.append([
            fr[: W * H].reshape(H, W),
            fr[W * H : W * H + fsz // 6].reshape(H // 2, W // 2),
            fr[W * H + fsz // 6 :].reshape(H // 2, W // 2),
        ])
    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H,
        quality=40,
    )
    enc = Encoder(info)
    enc.keyframe_freq = 4
    pkts = enc.flush_headers()
    for fr in frames:
        pkts.append(enc.encode_frame(fr))
    # A zero-length dup packet mid-stream (legal; decoder repeats).
    dup = Packet(b"", granulepos=pkts[-1].granulepos, e_o_s=False)
    pkts.insert(6, dup)
    return pkts


def _decode_bytes(pkts):
    dec = Decoder(parse_info_header(pkts[0].data),
                  parse_setup_header(pkts[2].data))
    out = bytearray()
    for p in pkts[3:]:
        dec.decode_packet(p.data)
        for pl in dec.ycbcr_out():
            out += pl.tobytes()
    return bytes(out)


def _packet_lacing(data):
    return [255] * (len(data) // 255) + [len(data) % 255]


def mux_spanning(packets, seg_per_page):
    """Every packet spans pages: at most seg_per_page lacing values per
    page, mid-packet flushes marked continued."""
    w = PageWriter(0x7453)
    out = bytearray()
    for p in packets:
        pos = 0
        lacing = _packet_lacing(p.data)
        for k, lv in enumerate(lacing):
            w._lacing.append(lv)
            w._data += p.data[pos : pos + lv]
            pos += lv
            if len(w._lacing) >= seg_per_page and k < len(lacing) - 1:
                out += w._flush_page(-1, False, continued=True)
        out += w._flush_page(p.granulepos, p.e_o_s, False)
    return bytes(out)


def mux_multiplexed(packets):
    """Interleave an alien logical stream (skeleton-like fishead/fisbone
    packets on their own serialno) with the Theora stream, alien BOS
    first -- demux_stream must pick the Theora stream by its header."""
    alien = PageWriter(0x0666)
    theo = PageWriter(0x7454)
    out = bytearray()
    fishead = Packet(b"fishead\x00" + b"\x00" * 56, granulepos=0)
    out += b"".join(alien.add_packet(fishead, flush=True))
    for i, p in enumerate(packets):
        out += b"".join(theo.add_packet(p, flush=True))
        if i % 2 == 0:
            bone = Packet(b"fisbone\x00" + bytes([i]) * 20, granulepos=0)
            out += b"".join(alien.add_packet(bone, flush=True))
    eos = Packet(b"", granulepos=0, e_o_s=True)
    out += b"".join(alien.add_packet(eos, flush=True))
    return bytes(out)


def mux_with_junk(packets):
    """Garbage between pages, including a fake OggS capture pattern with
    a bad CRC -- the reader must resync past both."""
    rng = np.random.RandomState(3)
    w = PageWriter(0x7455)
    out = bytearray()
    for i, p in enumerate(packets):
        pages = w.add_packet(p, flush=True)
        for pg in pages:
            out += pg
            if i % 3 == 0:
                out += bytes(rng.randint(0, 256, 17, dtype=np.uint8))
            if i % 4 == 1:
                # Fake page header: right magic, garbage CRC/body.
                out += b"OggS" + b"\x00" * 23 + bytes([2, 5, 5]) + b"0123456789"
    return bytes(out)


def test_spanning_pages_demux_bitexact():
    pkts = _encode_clip()
    truth = [p.data for p in pkts]
    for spp in (1, 2, 255):
        got = demux_stream(mux_spanning(pkts, spp))
        assert [p.data for p in got] == truth, f"seg_per_page={spp}"
    # And the decode of a spanning mux is bit-identical to the clean mux.
    clean = demux_stream(mux_stream(pkts))
    assert _decode_bytes(demux_stream(mux_spanning(pkts, 2))) == \
        _decode_bytes(clean)


def test_spanning_exact_255_multiple():
    """A packet whose length is an exact multiple of 255 needs the
    terminating 0 lacing value on both sides of the trip."""
    pkts = _encode_clip()
    pad = Packet(pkts[4].data + b"\x00" * (255 - len(pkts[4].data) % 255),
                 granulepos=pkts[4].granulepos)
    assert len(pad.data) % 255 == 0
    stream = [pkts[0], pkts[1], pkts[2], pad]
    got = demux_stream(mux_spanning(stream, 3))
    assert [p.data for p in got] == [p.data for p in stream]


def test_multiplexed_alien_stream():
    pkts = _encode_clip()
    got = demux_stream(mux_multiplexed(pkts))
    assert [p.data for p in got] == [p.data for p in pkts]
    assert _decode_bytes(got) == _decode_bytes(pkts)


def test_junk_and_fake_capture_resync():
    pkts = _encode_clip()
    got = demux_stream(mux_with_junk(pkts))
    assert [p.data for p in got] == [p.data for p in pkts]


def test_chained_physical_streams():
    """Two complete Theora streams concatenated (chained Ogg):
    demux_stream returns the first chain's packets."""
    pkts = _encode_clip()
    a = mux_stream(pkts, serialno=0x100)
    b = mux_stream(pkts, serialno=0x200)
    got = demux_stream(a + b)
    assert [p.data for p in got] == [p.data for p in pkts]


def test_corrupt_page_drops_continuation():
    """Flip a byte in a mid-stream page body: the page fails CRC and is
    dropped; a continuation tail on the next page must be DISCARDED
    (libogg resync), not emitted as a truncated packet."""
    pkts = _encode_clip()
    blob = bytearray(mux_spanning(pkts, 2))
    # Corrupt one body byte of a LATE page (well past the headers).
    offs = []
    idx = -1
    while True:
        idx = blob.find(b"OggS", idx + 1)
        if idx < 0:
            break
        offs.append(idx)
    idx = offs[-4]
    nsegs = blob[idx + 26]
    blob[idx + 27 + nsegs + 1] ^= 0xFF
    got = demux_stream(bytes(blob))
    truth = [p.data for p in pkts]
    # Every returned packet must be one of the original packets, in
    # order, with at least one (the corrupted one) missing -- and no
    # truncated hybrids.
    it = iter(truth)
    for p in got:
        while True:
            t = next(it)
            if t == p.data:
                break
    assert len(got) < len(truth)
    # Headers survived (corruption hit a data page), so decode of what
    # remains must not crash (robust-packet contract).
    dec = Decoder(parse_info_header(got[0].data),
                  parse_setup_header(got[2].data))
    for p in got[3:]:
        dec.decode_packet(p.data)


def test_spanning_stream_in_reference_decoder():
    """The re-muxed (page-spanning) stream written back to tpkt decodes
    in the REFERENCE decoder identically to our decoder."""
    if not ensure_ref_oracle():
        pytest.skip("no reference oracle")
    pkts = _encode_clip()
    got = demux_stream(mux_spanning(pkts, 2))
    tpkt = "/tmp/test_ogg_adv.tpkt"
    yuv = "/tmp/test_ogg_adv.yuv"
    write_tpkt(tpkt, got)
    subprocess.run(
        [os.path.join(REPO_ROOT, "refbuild", "build", "ref_dec"),
         tpkt, yuv],
        check=True, capture_output=True,
    )
    assert open(yuv, "rb").read() == _decode_bytes(got)
