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


def test_ogg_crc_rejects_corrupt_page():
    """A corrupted page is dropped and the reader resyncs on the next
    page (libogg semantics); false 'OggS' matches in bodies are skipped."""
    from theora_tpu.ogg import PageReader
    from theora_tpu.tpkt import Packet

    pkts = [
        Packet(b"A" * 100, granulepos=1),
        Packet(b"B" * 100, granulepos=2),
        Packet(b"C" * 100, granulepos=3),
    ]
    ogg = bytearray(mux_stream(pkts))
    # Corrupt one body byte of the second page.
    second = ogg.index(b"OggS", 4)
    ogg[second + 40] ^= 0xFF
    out = [p for _, p in PageReader(bytes(ogg)).packets()]
    assert [p.data for p in out] == [pkts[0].data, pkts[2].data]
    # A false capture pattern inside a body must not derail parsing.
    fake = Packet(b"zz" + b"OggS" + b"\x00" * 60, granulepos=9)
    ogg2 = mux_stream([fake])
    out2 = [p for _, p in PageReader(ogg2).packets()]
    assert len(out2) == 1 and out2[0].data == fake.data


def test_transcode_rejects_cbr():
    import pytest

    from theora_tpu.info import TheoraInfo
    from theora_tpu.parallel.transcode import transcode

    info = TheoraInfo(frame_width=16, frame_height=16, target_bitrate=1000)
    with pytest.raises(ValueError):
        transcode([], info)


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


def _make_ogv(tmp_path):
    from theora_tpu.encode.encoder import Encoder
    from theora_tpu.info import TheoraInfo

    W, H = 64, 48
    raw = np.fromfile(os.path.join(TESTDATA, "clip64x48.i420"), np.uint8)
    fsz = W * H * 3 // 2
    frames = []
    for i in range(4):
        f = raw[i * fsz : (i + 1) * fsz]
        frames.append(
            [
                f[: W * H].reshape(H, W),
                f[W * H : W * H + fsz // 6].reshape(H // 2, W // 2),
                f[W * H + fsz // 6 :].reshape(H // 2, W // 2),
            ]
        )
    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H, quality=40
    )
    enc = Encoder(info)
    enc.keyframe_freq = 4
    pkts = enc.flush_headers()
    for i, fr in enumerate(frames):
        pkts.append(enc.encode_frame(fr, e_o_s=(i == 3)))
    out = tmp_path / "clip.ogv"
    out.write_bytes(mux_stream(pkts))
    return out


def test_play_tool_stats(tmp_path):
    """play.py decodes with pacing stats (player_example analogue)."""
    import subprocess
    import sys

    ogv = _make_ogv(tmp_path)
    r = subprocess.run(
        [sys.executable, "-m", "theora_tpu.tools.play", "--stats-only",
         str(ogv)],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0
    assert "played" in r.stderr


def test_play_tool_sdl_display(tmp_path):
    """play.py's SDL window path (player_example.c analogue) renders
    every frame under SDL's headless dummy driver."""
    import subprocess
    import sys

    import pytest

    try:
        import pygame  # noqa: F401
    except ImportError:
        pytest.skip("pygame unavailable")
    ogv = _make_ogv(tmp_path)
    env = dict(os.environ, SDL_VIDEODRIVER="dummy",
               SDL_AUDIODRIVER="dummy")
    r = subprocess.run(
        [sys.executable, "-m", "theora_tpu.tools.play", str(ogv)],
        capture_output=True, text=True, timeout=120, env=env,
    )
    assert r.returncode == 0
    assert "display unavailable" not in r.stderr
    assert "played 4/4" in r.stderr


def test_img2theora_tool(tmp_path):
    """img2theora encodes an image sequence to a decodable stream."""
    import subprocess
    import sys

    try:
        from PIL import Image
    except ImportError:
        import pytest

        pytest.skip("PIL unavailable")
    for i in range(3):
        arr = np.full((48, 64, 3), 40 * i + 60, np.uint8)
        Image.fromarray(arr).save(tmp_path / f"f{i:02d}.png")
    out = tmp_path / "seq.ogv"
    r = subprocess.run(
        [sys.executable, "-m", "theora_tpu.tools.img2theora", "-q", "40",
         str(tmp_path / "f*.png"), str(out)],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr
    from theora_tpu.decode.decoder import Decoder
    from theora_tpu.headers import parse_info_header, parse_setup_header
    from theora_tpu.ogg import demux_stream

    pkts = demux_stream(out.read_bytes())
    dec = Decoder(parse_info_header(pkts[0].data),
                  parse_setup_header(pkts[2].data))
    for p in pkts[3:]:
        dec.decode_packet(p.data)
    assert len(pkts) == 6


def test_ogg_large_packet_spanning(tmp_path):
    """Packets far larger than one Ogg page (noisy high-quality keyframe)
    must round-trip through mux/demux."""
    from theora_tpu.encode.encoder import Encoder
    from theora_tpu.info import TheoraInfo
    from theora_tpu.ogg import demux_stream, mux_stream

    rng = np.random.RandomState(0)
    W, H = 320, 240
    fr = [rng.randint(0, 256, size=(H, W)).astype(np.uint8),
          rng.randint(0, 256, size=(H // 2, W // 2)).astype(np.uint8),
          rng.randint(0, 256, size=(H // 2, W // 2)).astype(np.uint8)]
    info = TheoraInfo(frame_width=W, frame_height=H, pic_width=W,
                      pic_height=H, quality=63)
    enc = Encoder(info)
    pkts = enc.flush_headers()
    pkts.append(enc.encode_frame(fr, e_o_s=True))
    assert len(pkts[3].data) > 100_000  # spans multiple pages
    back = demux_stream(mux_stream(pkts))
    assert [p.data for p in back] == [p.data for p in pkts]
    assert back[3].granulepos == pkts[3].granulepos


def test_long_stream_granulepos():
    """Granule positions across many GOPs at a large keyframe shift."""
    from theora_tpu.encode.encoder import Encoder
    from theora_tpu.decode.decoder import Decoder
    from theora_tpu.headers import parse_info_header, parse_setup_header
    from theora_tpu.info import TheoraInfo

    W, H = 32, 32
    fr = [np.full((H, W), 128, np.uint8),
          np.full((H // 2, W // 2), 128, np.uint8),
          np.full((H // 2, W // 2), 128, np.uint8)]
    info = TheoraInfo(frame_width=W, frame_height=H, pic_width=W,
                      pic_height=H, quality=40, keyframe_granule_shift=31)
    enc = Encoder(info)
    enc.keyframe_freq = 64
    enc.auto_keyframe = False
    pkts = enc.flush_headers()
    dec = Decoder(parse_info_header(pkts[0].data),
                  parse_setup_header(pkts[2].data))
    for i in range(150):
        p = enc.encode_frame(fr)
        dec.decode_packet(p.data)
        assert dec.granpos == p.granulepos, f"frame {i}"
        kf = i - (i % 64)
        assert p.granulepos == ((kf + 1) << 31) + (i - kf)


def test_av_mux_vorbis_roundtrip(tmp_path):
    """A/V mux (encoder_example.c:1790-1860 analogue): encode video +
    Vorbis audio into one Ogg stream with page end-time interleaving;
    the Theora stream decodes bit-exact and the Vorbis stream decodes
    back to the source tone via libvorbis synthesis."""
    import struct

    import pytest

    from theora_tpu.ogg import PageReader, demux_stream, mux_av
    from theora_tpu.tools import vorbis as vb

    if not vb.available():
        pytest.skip("system libvorbis unavailable")
    from theora_tpu.decode.decoder import Decoder
    from theora_tpu.encode.encoder import Encoder
    from theora_tpu.headers import parse_info_header, parse_setup_header
    from theora_tpu.info import TheoraInfo

    W, H, N = 64, 48, 8
    frames = [
        [
            ((np.mgrid[0:H, 0:W][1] * 3 + 5 * i) % 256).astype(np.uint8),
            np.full((H // 2, W // 2), 90, np.uint8),
            np.full((H // 2, W // 2), 160, np.uint8),
        ]
        for i in range(N)
    ]
    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H,
        quality=40, fps_numerator=30, fps_denominator=1,
    )
    enc = Encoder(info)
    enc.keyframe_freq = 4
    vpkts = enc.flush_headers()
    for i, fr in enumerate(frames):
        vpkts.append(enc.encode_frame(fr, e_o_s=i == N - 1))

    rate = 48000
    t = np.arange(int(rate * N / 30)) / rate
    tone = (np.sin(2 * np.pi * 440 * t) * 0.4).astype(np.float32)[:, None]
    venc = vb.VorbisEncoder(1, rate, 0.2)
    apkts = venc.headers()
    apkts += venc.encode(tone)
    apkts += venc.finish()

    shift = info.keyframe_granule_shift

    def vtime(gp):
        return ((gp >> shift) + (gp & ((1 << shift) - 1)) + 1) / 30.0

    data = mux_av(vpkts, apkts, vtime, lambda gp: gp / rate)

    # Structure: two BOS pages first (video then audio), page CRCs valid,
    # both streams complete with EOS.
    pr = PageReader(data)
    pages = list(pr.pages())
    assert pages[0]["htype"] & 0x02 and pages[1]["htype"] & 0x02
    streams = {}
    for sn, p in PageReader(data).packets():
        streams.setdefault(sn, []).append(p)
    assert len(streams) == 2
    got_v = demux_stream(data)
    assert [p.data for p in got_v] == [p.data for p in vpkts]
    a_sn = [sn for sn, ps in streams.items()
            if ps[0].data[:7] == b"\x01vorbis"][0]
    got_a = streams[a_sn]
    assert [p.data for p in got_a] == [p.data for p in apkts]
    assert got_a[-1].e_o_s

    # Video decodes bit-exact vs direct packet decode.
    dec = Decoder(parse_info_header(vpkts[0].data),
                  parse_setup_header(vpkts[2].data))
    for i, p in enumerate(got_v[3:]):
        dec.decode_packet(p.data)

    # Audio decodes back to the 440 Hz tone.
    adec = vb.VorbisDecoder(got_a[:3])
    pcm = np.concatenate([adec.decode(p) for p in got_a[3:]], axis=0)
    assert pcm.shape[0] >= len(tone) - 1024
    seg = pcm[2048 : 2048 + 4096, 0]
    freqs = np.fft.rfftfreq(len(seg), 1.0 / rate)
    dom = freqs[np.abs(np.fft.rfft(seg)).argmax()]
    assert abs(dom - 440.0) < 15.0
