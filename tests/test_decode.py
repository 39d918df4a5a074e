"""Golden-stream decode conformance: bit-exact reconstruction vs the
reference decoder's output on reference-encoder streams (SURVEY.md section 4:
the conformance tests the reference itself lacks)."""
import os

import numpy as np
import pytest

from tests.conftest import TESTDATA
from theora_tpu.decode.decoder import Decoder
from theora_tpu.headers import parse_info_header, parse_setup_header
from theora_tpu.tpkt import read_tpkt

STREAMS = [
    "clip64x48_k1_q48",     # keyframe-only
    "clip64x48_k8_q48",     # inter + MC
    "clip64x48_k8_q20",     # loop filter active
    "clip64x48_k8_q5",      # strong quant + loop filter
    "cif_k4_q40",           # CIF inter
    "cif_cbr",              # rate-controlled (dup frames possible)
    "crop80x64",            # cropped picture region
    "clip422",              # 4:2:2 chroma
    "clip444",              # 4:4:4 chroma
]


@pytest.mark.parametrize("name", STREAMS)
def test_bit_exact_decode(name):
    pkts = read_tpkt(os.path.join(TESTDATA, f"{name}.tpkt"))
    info = parse_info_header(pkts[0].data)
    setup = parse_setup_header(pkts[2].data)
    dec = Decoder(info, setup)
    ref = np.fromfile(os.path.join(TESTDATA, f"{name}.ref.yuv"), dtype=np.uint8)
    W, H = info.frame_width, info.frame_height
    fsz = W * H + 2 * (W >> info.hdec) * (H >> info.vdec)
    nframes = len(ref) // fsz
    ref = ref.reshape(nframes, fsz)
    for i, p in enumerate(pkts[3:]):
        dec.decode_packet(p.data)
        mine = np.concatenate([pl.reshape(-1) for pl in dec.ycbcr_out()])
        assert np.array_equal(mine, ref[i]), f"{name} frame {i} not bit-exact"
        assert dec.granpos == p.granulepos, f"{name} frame {i} granulepos"


@pytest.mark.parametrize("pp_level", [2, 7])
def test_postprocessor_bit_exact(pp_level):
    name = "clip64x48_k8_q5"
    pkts = read_tpkt(os.path.join(TESTDATA, f"{name}.tpkt"))
    info = parse_info_header(pkts[0].data)
    setup = parse_setup_header(pkts[2].data)
    dec = Decoder(info, setup)
    dec.set_pplevel(pp_level)
    ref = np.fromfile(
        os.path.join(TESTDATA, f"{name}.pp{pp_level}.yuv"), dtype=np.uint8
    )
    W, H = info.frame_width, info.frame_height
    fsz = W * H * 3 // 2
    ref = ref.reshape(-1, fsz)
    for i, p in enumerate(pkts[3:]):
        dec.decode_packet(p.data)
        mine = np.concatenate([pl.reshape(-1) for pl in dec.ycbcr_out()])
        assert np.array_equal(mine, ref[i]), f"pp{pp_level} frame {i}"


def test_telemetry_overlays():
    """Telemetry overlays (TH_DECCTL_SET_TELEMETRY_* analogue) must draw
    on the output without corrupting reference state: the NEXT frame must
    still decode bit-exactly."""
    name = "cif_k4_q40"
    pkts = read_tpkt(os.path.join(TESTDATA, f"{name}.tpkt"))
    info = parse_info_header(pkts[0].data)
    setup = parse_setup_header(pkts[2].data)
    dec = Decoder(info, setup)
    dec.set_telemetry(mbmode=1, mv=1, qi=1, bits=1)
    ref = np.fromfile(
        os.path.join(TESTDATA, f"{name}.ref.yuv"), dtype=np.uint8
    ).reshape(len(pkts) - 3, -1)
    changed_any = False
    for i, p in enumerate(pkts[3:4 + 2]):
        dec.decode_packet(p.data)
        overlaid = np.concatenate([x.reshape(-1) for x in dec.ycbcr_out()])
        if not np.array_equal(overlaid, ref[i]):
            changed_any = True
        # Overlay must be output-only: disabling telemetry must give the
        # bit-exact frame from the same internal state.
        dec.set_telemetry(mbmode=0, mv=0, qi=0, bits=0)
        clean = np.concatenate([x.reshape(-1) for x in dec.ycbcr_out()])
        assert np.array_equal(clean, ref[i]), f"frame {i} state corrupted"
        dec.set_telemetry(mbmode=1, mv=1, qi=1, bits=1)
    assert changed_any, "telemetry drew nothing"


def test_corrupt_packets_never_crash():
    """Truncated, bit-flipped, and random packets must decode to a clean
    Python exception or a best-effort frame -- never a crash (the
    reference's TH_EBADPACKET robustness; bitpack.c EOF-zeros)."""
    pkts = read_tpkt(os.path.join(TESTDATA, "cif_k4_q40.tpkt"))
    info = parse_info_header(pkts[0].data)
    setup = parse_setup_header(pkts[2].data)
    rng = np.random.RandomState(7)
    for trial in range(30):
        dec = Decoder(info, setup)
        try:
            dec.decode_packet(pkts[3].data)
            data = bytearray(pkts[4].data)
            if trial % 3 == 0:
                data = data[: rng.randint(1, len(data))]
            elif trial % 3 == 1:
                for _ in range(4):
                    data[rng.randint(4, len(data))] ^= 1 << rng.randint(8)
            else:
                data = bytes([data[0] & 0x7F]) + rng.bytes(
                    rng.randint(1, 300)
                )
            dec.decode_packet(bytes(data))
            dec.ycbcr_out()
        except Exception:
            pass  # clean rejection is fine


def test_compat_bad_packet_returns_error():
    from theora_tpu.compat import TH_EBADPACKET, th_decode_alloc

    pkts = read_tpkt(os.path.join(TESTDATA, "cif_k4_q40.tpkt"))
    info = parse_info_header(pkts[0].data)
    setup = parse_setup_header(pkts[2].data)
    ctx = th_decode_alloc({"info": info, "setup": setup})
    ret, _ = ctx.packetin(pkts[3].data)
    assert ret == 0
    ret, _ = ctx.packetin(bytes([0x00]) + b"\xff" * 50)
    assert ret in (0, TH_EBADPACKET)


def test_crosscheck_reverse_slice():
    """A slice of the reverse conformance campaign: random REFERENCE
    encoder configs must decode bit-identically in both decoders."""
    import pytest

    from tests.conftest import ensure_ref_oracle

    if not ensure_ref_oracle():
        pytest.skip("reference oracle unavailable")
    from theora_tpu.tools.crosscheck import run_reverse_trial

    rng = np.random.RandomState(17)
    for t in range(4):
        desc, err = run_reverse_trial(rng, t)
        assert err is None, f"{desc}: {err}"


@pytest.mark.parametrize("name", ["cif_k4_q40", "cif_cbr", "clip444", "clip422"])
def test_striped_decode_bit_exact_and_incremental(name):
    """Striped decode callback (TH_DECCTL_SET_STRIPE_CB semantics,
    decode.c:2858-2943): fires >1 time per frame with contiguous
    bottom-to-top luma fragment-row ranges, each delivered row final at
    callback time, zero callbacks for dup frames, and the final frame
    bit-exact vs an unstriped decode."""
    pkts = read_tpkt(os.path.join(TESTDATA, f"{name}.tpkt"))
    info = parse_info_header(pkts[0].data)
    setup = parse_setup_header(pkts[2].data)
    plain = Decoder(info, setup)
    striped = Decoder(info, setup)
    vsh = info.vdec
    log = []

    def cb(ycbcr, a, b):
        log.append(
            (a, b,
             [p[(a * 8) >> (vsh if i else 0) : (b * 8) >> (vsh if i else 0)].copy()
              for i, p in enumerate(ycbcr)])
        )

    striped.stripe_callback = cb
    nvy = info.frame_height // 8
    for p in pkts[3:]:
        log.clear()
        plain.decode_packet(p.data)
        ret = striped.decode_packet(p.data)
        a = plain.ycbcr_out()
        b = striped.ycbcr_out()
        for pli in range(3):
            assert np.array_equal(a[pli], b[pli])
        if ret != 0:
            assert log == []  # dup/drop frames fire no callbacks
            continue
        assert len(log) > 1
        assert log[0][1] == nvy and log[-1][0] == 0
        assert [s[1] for s in log][1:] == [s[0] for s in log][:-1]
        for a0, b0, rows in log:
            for pli in range(3):
                sh = vsh if pli else 0
                assert np.array_equal(
                    rows[pli], b[pli][(a0 * 8) >> sh : (b0 * 8) >> sh]
                ), f"{name} stripe [{a0},{b0}) plane {pli} not final at callback"
