"""Encoder conformance: our packets must decode bit-identically in our own
decoder (closed loop) and carry correct granule positions. Cross-validation
against the reference decoder binary happens in refbuild (see
tools/crosscheck.py)."""
import os

import numpy as np
import pytest

from tests.conftest import TESTDATA
from theora_tpu.decode.decoder import Decoder
from theora_tpu.encode.encoder import Encoder
from theora_tpu.headers import (
    parse_info_header,
    parse_setup_header,
)
from theora_tpu.info import TheoraInfo


def _load_clip(name, W, H):
    raw = np.fromfile(os.path.join(TESTDATA, name), dtype=np.uint8)
    fsz = W * H + 2 * (W // 2) * (H // 2)
    n = len(raw) // fsz
    frames = []
    for i in range(n):
        f = raw[i * fsz : (i + 1) * fsz]
        frames.append(
            [
                f[: W * H].reshape(H, W),
                f[W * H : W * H + W * H // 4].reshape(H // 2, W // 2),
                f[W * H + W * H // 4 :].reshape(H // 2, W // 2),
            ]
        )
    return frames


@pytest.mark.parametrize("quality,kf_freq", [(48, 1), (20, 1), (48, 4)])
def test_encode_decode_closed_loop(quality, kf_freq):
    W, H = 64, 48
    frames = _load_clip("clip64x48.i420", W, H)[:4]
    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H,
        quality=quality,
    )
    enc = Encoder(info)
    enc.keyframe_freq = kf_freq
    pkts = enc.flush_headers()
    for i, fr in enumerate(frames):
        pkts.append(enc.encode_frame(fr, e_o_s=(i == len(frames) - 1)))

    dinfo = parse_info_header(pkts[0].data)
    setup = parse_setup_header(pkts[2].data)
    dec = Decoder(dinfo, setup)
    for i, p in enumerate(pkts[3:]):
        dec.decode_packet(p.data)
        assert dec.granpos == p.granulepos
        out = dec.ycbcr_out()
        # The encoder's embedded decoder state must match an independent
        # decode of the stream.
        for pli in range(3):
            enc_recon = enc._dec.ycbcr_out()[pli] if i == len(frames) - 1 else None
            if enc_recon is not None:
                assert np.array_equal(out[pli], enc_recon)
        # Sanity: reconstruction should be reasonably close to the input.
        err = out[0].astype(float) - frames[i][0].astype(float)
        psnr = 10 * np.log10(255.0**2 / max(np.mean(err**2), 1e-9))
        assert psnr > 28.0, f"frame {i} PSNR {psnr}"


def test_adaptive_quant_stream_decodes():
    W, H = 64, 48
    frames = _load_clip("clip64x48.i420", W, H)[:3]
    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H, quality=40
    )
    enc = Encoder(info)
    enc.keyframe_freq = 8
    enc.adaptive_quant = True
    pkts = enc.flush_headers()
    for i, fr in enumerate(frames):
        pkts.append(enc.encode_frame(fr))
    assert len(enc.frame_qis) == 3
    dinfo = parse_info_header(pkts[0].data)
    setup = parse_setup_header(pkts[2].data)
    dec = Decoder(dinfo, setup)
    for i, p in enumerate(pkts[3:]):
        dec.decode_packet(p.data)
        out = dec.ycbcr_out()
        err = out[0].astype(float) - frames[i][0].astype(float)
        psnr = 10 * np.log10(255.0**2 / max(np.mean(err**2), 1e-9))
        assert psnr > 28.0


def test_trellis_beats_heuristic_quantizer():
    """The exact-cost trellis tokenizer (tokenize.c:457-744 analogue) must
    produce smaller streams than the heuristic R/D quantizer at comparable
    quality, and they must still decode."""
    W, H = 64, 48
    frames = _load_clip("clip64x48.i420", W, H)[:6]
    sizes = {}
    outs = {}
    for trellis in (False, True):
        info = TheoraInfo(
            frame_width=W, frame_height=H, pic_width=W, pic_height=H,
            quality=40,
        )
        enc = Encoder(info)
        enc.keyframe_freq = 8
        enc.use_trellis = trellis
        pkts = enc.flush_headers()
        for fr in frames:
            pkts.append(enc.encode_frame(fr))
        dinfo = parse_info_header(pkts[0].data)
        setup = parse_setup_header(pkts[2].data)
        dec = Decoder(dinfo, setup)
        mse = 0.0
        for i, p in enumerate(pkts[3:]):
            dec.decode_packet(p.data)
            out = dec.ycbcr_out()
            mse += np.mean(
                (out[0].astype(float) - frames[i][0].astype(float)) ** 2
            )
        sizes[trellis] = sum(len(p.data) for p in pkts[3:])
        outs[trellis] = mse / len(frames)
    # The trellis runs at the reference's (stronger) lambda, trading a
    # little distortion for much smaller streams: require the byte win and
    # bound the distortion cost.
    assert sizes[True] < sizes[False]
    assert outs[True] <= outs[False] * 1.25


@pytest.mark.parametrize(
    "pixel_fmt,cw_div,ch_div", [(2, 2, 1), (3, 1, 1)]
)
def test_encode_422_444_decodes(pixel_fmt, cw_div, ch_div):
    """Inter encoding through the chroma-MV derivation paths for 4:2:2 and
    4:4:4 (the native fill's pixel_fmt branches) must produce decodable,
    reasonable streams."""
    W, H = 64, 48
    rng = np.random.RandomState(9)

    def grad(i, h, w):
        y, x = np.mgrid[0:h, 0:w]
        return ((x * 3 + y * 2 + i * 5) % 256).astype(np.uint8)

    frames = [
        [grad(i, H, W), grad(i + 3, H // ch_div, W // cw_div),
         grad(i + 9, H // ch_div, W // cw_div)]
        for i in range(5)
    ]
    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H,
        quality=40, pixel_fmt=pixel_fmt,
    )
    enc = Encoder(info)
    enc.keyframe_freq = 8
    pkts = enc.flush_headers()
    for fr in frames:
        pkts.append(enc.encode_frame(fr))
    dec = Decoder(parse_info_header(pkts[0].data), parse_setup_header(pkts[2].data))
    for i, p in enumerate(pkts[3:]):
        dec.decode_packet(p.data)
        out = dec.ycbcr_out()
        for pli in range(3):
            err = out[pli].astype(float) - frames[i][pli].astype(float)
            psnr = 10 * np.log10(255.0**2 / max(np.mean(err**2), 1e-9))
            assert psnr > 30.0, f"frame {i} plane {pli} PSNR {psnr}"


def test_encode_cropped_pic_decodes():
    """Non-frame-aligned pic geometry (pic offset/size) round-trips."""
    W, H = 80, 64
    rng = np.random.RandomState(5)

    def grad(i, h, w):
        y, x = np.mgrid[0:h, 0:w]
        return ((x * 5 + y * 3 + i * 7) % 256).astype(np.uint8)

    frames = [
        [grad(i, H, W), grad(i, H // 2, W // 2), grad(i + 4, H // 2, W // 2)]
        for i in range(4)
    ]
    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=75, pic_height=57,
        pic_x=1, pic_y=3, quality=40,
    )
    enc = Encoder(info)
    enc.keyframe_freq = 8
    pkts = enc.flush_headers()
    for fr in frames:
        pkts.append(enc.encode_frame(fr))
    dec = Decoder(parse_info_header(pkts[0].data), parse_setup_header(pkts[2].data))
    for i, p in enumerate(pkts[3:]):
        dec.decode_packet(p.data)
        out = dec.ycbcr_out()
        err = out[0].astype(float) - frames[i][0].astype(float)
        psnr = 10 * np.log10(255.0**2 / max(np.mean(err**2), 1e-9))
        assert psnr > 30.0


def test_scene_cut_auto_keyframe():
    """An inter frame that codes bigger than the last keyframe is recoded
    as a keyframe (the frame-level intra/inter comparison,
    analyze.c:2690-2711)."""
    from theora_tpu.compat import th_packet_iskeyframe

    W, H = 64, 48
    frames = _load_clip("clip64x48.i420", W, H)[:3]
    rng = np.random.RandomState(1)
    cut = [
        rng.randint(0, 256, size=(H, W)).astype(np.uint8),
        rng.randint(0, 256, size=(H // 2, W // 2)).astype(np.uint8),
        rng.randint(0, 256, size=(H // 2, W // 2)).astype(np.uint8),
    ]
    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H, quality=40
    )
    enc = Encoder(info)
    enc.keyframe_freq = 64
    pkts = enc.flush_headers()
    for fr in frames + [cut]:
        pkts.append(enc.encode_frame(fr))
    kinds = [th_packet_iskeyframe(p.data) for p in pkts[3:]]
    assert kinds[0] == 1 and kinds[-1] == 1, kinds
    dec = Decoder(parse_info_header(pkts[0].data), parse_setup_header(pkts[2].data))
    for p in pkts[3:]:
        dec.decode_packet(p.data)
        assert dec.granpos == p.granulepos


def test_adaptive_quant_auto_rescues_high_qi_texture():
    """The round-3 sweep found the single-qi ladder collapses on dense
    texture at high qi (q56 textured: -3.6 dB vs the reference, which
    masks by default).  The "auto" default must engage the reference-
    spec qi triple there and recover multiple dB; below the gate,
    STRUCTURED content must stay single-qi (iid-noise-like content at
    mid-q engages via the round-4 noise gate instead -- asserted
    separately below)."""
    rng = np.random.RandomState(7)
    W, H = 176, 144
    tex = rng.randint(0, 160, (H + 32, W + 32)).astype(np.int32)
    # Structure the texture (horizontal box filter): lag-1 ac rises
    # well above the noise-gate threshold while the content stays
    # dense texture.
    tex = (tex + np.roll(tex, 1, 1) + np.roll(tex, 2, 1)) // 3
    frames = []
    for t in range(8):
        y = (tex[t:t + H, 2 * t:2 * t + W] + 48).clip(0, 255)
        frames.append([
            y.astype(np.uint8),
            np.full((H // 2, W // 2), 110, np.uint8),
            np.full((H // 2, W // 2), 140, np.uint8),
        ])

    def encode(qi, aq):
        enc = Encoder(TheoraInfo(
            frame_width=W, frame_height=H, pic_width=W, pic_height=H,
            quality=qi,
        ))
        enc.keyframe_freq = 8
        enc.adaptive_quant = aq
        pkts = enc.flush_headers()
        for fr in frames:
            pkts.append(enc.encode_frame(fr))
        dec = Decoder(parse_info_header(pkts[0].data),
                      parse_setup_header(pkts[2].data))
        se = 0.0
        for i, p in enumerate(pkts[3:]):
            dec.decode_packet(p.data)
            d = dec.ycbcr_out()[0].astype(np.float64) - frames[i][0]
            se += (d * d).mean()
        return enc.frame_qis, 10 * np.log10(255.0**2 / (se / len(frames)))

    qis_on, psnr_on = encode(56, "auto")
    assert len(qis_on) == 3, qis_on  # gate engaged at q56
    qis_off, psnr_off = encode(56, False)
    assert len(qis_off) == 1
    assert psnr_on - psnr_off > 2.0, (psnr_on, psnr_off)
    qis_low, _ = encode(40, "auto")
    assert len(qis_low) == 1, qis_low  # below the gate: single-qi


def test_noise_gate_engages_masking_at_mid_qi():
    """Round 4: on iid-noise-like frames at mid-q the reference's
    default masking lands ~1 dB above our single-qi curve on BOTH
    PSNR and SSIM (BASELINE), so "auto" engages the qi triple there,
    gated by the lag-1 luma autocorrelation test (_noise_like); the
    chooser runs at the cheaper 0.25 lambda.  Structured content at
    the same qi stays single-qi (covered by the test above)."""
    rng = np.random.RandomState(11)
    W, H = 176, 144
    frames = [
        [rng.randint(0, 256, (H, W)).astype(np.uint8),
         rng.randint(0, 256, (H // 2, W // 2)).astype(np.uint8),
         rng.randint(0, 256, (H // 2, W // 2)).astype(np.uint8)]
        for _ in range(4)
    ]
    enc = Encoder(TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H,
        quality=40,
    ))
    enc.keyframe_freq = 8
    enc.adaptive_quant = "auto"
    enc.flush_headers()
    for fr in frames:
        enc.encode_frame(fr)
    assert enc._frame_noise_like
    assert len(enc.frame_qis) == 3, enc.frame_qis
    assert enc._aq_scale_frame == 0.25
    # The discriminator itself: noise ~0 ac, smooth ~1.
    assert Encoder._noise_like(frames[0][0])
    yy = np.broadcast_to(
        np.arange(W, dtype=np.uint8), (H, W)
    ).copy()
    assert not Encoder._noise_like(yy)


def test_cbr_crosses_masking_gate_and_reference_decodes():
    """CBR on easy content drives qi past the adaptive-quant auto gate:
    frames must carry a multi-qi list mid-stream and the stream must
    still decode bit-exactly in the reference decoder (rate control x
    masking interaction)."""
    import subprocess

    from tests.conftest import REPO_ROOT, ensure_ref_oracle
    from theora_tpu.tpkt import write_tpkt

    if not ensure_ref_oracle():
        pytest.skip("no reference oracle")
    yy, xx = np.mgrid[0:48, 0:64]
    frames = [
        [
            (120 + 60 * np.sin((xx + 2 * t) / 11.0)).astype(np.uint8),
            np.full((24, 32), 120, np.uint8),
            np.full((24, 32), 136, np.uint8),
        ]
        for t in range(12)
    ]
    info = TheoraInfo(
        frame_width=64, frame_height=48, pic_width=64, pic_height=48,
        quality=0, target_bitrate=400_000, fps_numerator=30,
        fps_denominator=1,
    )
    enc = Encoder(info)
    enc.keyframe_freq = 8
    pkts = enc.flush_headers()
    multi = 0
    for i, fr in enumerate(frames):
        pkts.append(enc.encode_frame(fr, e_o_s=(i == len(frames) - 1)))
        multi += len(enc.frame_qis) > 1
    assert multi > 0, "generous CBR never engaged the masking gate"
    tpkt = "/tmp/test_cbr_mask.tpkt"
    yuv = "/tmp/test_cbr_mask.yuv"
    write_tpkt(tpkt, pkts)
    subprocess.run(
        [os.path.join(REPO_ROOT, "refbuild", "build", "ref_dec"),
         tpkt, yuv],
        check=True, capture_output=True,
    )
    ref = open(yuv, "rb").read()
    dec = Decoder(parse_info_header(pkts[0].data),
                  parse_setup_header(pkts[2].data))
    ours = bytearray()
    for p in pkts[3:]:
        dec.decode_packet(p.data)
        for pl in dec.ycbcr_out():
            ours += pl.tobytes()
    assert bytes(ours) == ref


def test_mode_rd_stream_decodes_and_seeds_chains():
    """The fitted-R/D mode decision (mode_rd, study path): streams must
    decode bit-exactly in the reference decoder, and the multi-level
    seeding walk must actually seed the last-MV chain on a smooth pan
    (the all-NOMV collapse of the naive greedy walk is the regression
    this guards)."""
    import subprocess

    from tests.conftest import REPO_ROOT, ensure_ref_oracle
    from theora_tpu.encode import modedec
    from theora_tpu.tpkt import write_tpkt

    if not modedec.tables_available():
        pytest.skip("modedec tables not generated")
    W, H = 96, 80
    yy, xx = np.mgrid[0:H, 0:W]
    frames = []
    for t in range(6):
        y = (110 + 70 * np.sin((xx + 3 * t) / 17.0)
             + 30 * np.cos(yy / 13.0)).clip(0, 255).astype(np.uint8)
        frames.append([
            y, np.full((H // 2, W // 2), 120, np.uint8),
            np.full((H // 2, W // 2), 136, np.uint8),
        ])
    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H,
        quality=40,
    )
    enc = Encoder(info)
    enc.keyframe_freq = 8
    enc.mode_rd = True
    pkts = enc.flush_headers()
    modes_seen = set()
    orig = Encoder._encode_inter_tail
    import inspect

    sig = inspect.signature(orig)

    def spy(self, *a, **k):
        ba = sig.bind(self, *a, **k)
        modes_seen.update(
            int(m) for m in ba.arguments["mb_modes"][ba.arguments["mb_list"]]
        )
        return orig(self, *a, **k)

    Encoder._encode_inter_tail = spy
    try:
        for fr in frames:
            pkts.append(enc.encode_frame(fr))
    finally:
        Encoder._encode_inter_tail = orig
    # The pan must be tracked through MV-bearing modes (chain seeded).
    from theora_tpu.constants import (
        MODE_INTER_MV,
        MODE_INTER_MV_LAST,
        MODE_INTER_MV_LAST2,
    )

    assert modes_seen & {MODE_INTER_MV, MODE_INTER_MV_LAST,
                         MODE_INTER_MV_LAST2}, modes_seen
    # Bit-exact in the reference decoder.
    if not ensure_ref_oracle():
        pytest.skip("no reference oracle")
    tpkt = "/tmp/test_mode_rd.tpkt"
    yuv = "/tmp/test_mode_rd.yuv"
    write_tpkt(tpkt, pkts)
    subprocess.run(
        [os.path.join(REPO_ROOT, "refbuild", "build", "ref_dec"),
         tpkt, yuv],
        check=True, capture_output=True,
    )
    ref = open(yuv, "rb").read()
    dec = Decoder(parse_info_header(pkts[0].data),
                  parse_setup_header(pkts[2].data))
    ours = bytearray()
    for p in pkts[3:]:
        dec.decode_packet(p.data)
        for pl in dec.ycbcr_out():
            ours += pl.tobytes()
    assert bytes(ours) == ref


def test_crosscheck_random_configs():
    """A slice of the randomized conformance campaign: random geometry /
    format / qi / kf / CBR encodes must decode bit-identically in the
    reference decoder and ours (full campaign: tools/crosscheck.py)."""
    import pytest

    from tests.conftest import ensure_ref_oracle

    if not ensure_ref_oracle():
        pytest.skip("reference oracle unavailable")
    from theora_tpu.tools.crosscheck import run_trial

    rng = np.random.RandomState(3)
    for t in range(6):
        desc, err = run_trial(rng, t)
        assert err is None, f"{desc}: {err}"


def test_encoder_output_stability():
    """Pinned digest of a fixed encode: catches unintended bitstream
    changes. Intentional encoder improvements should update the digest
    (and re-verify size/PSNR vs the reference first)."""
    import hashlib

    frames = _load_clip("clip64x48.i420", 64, 48)[:6]
    info = TheoraInfo(
        frame_width=64, frame_height=48, pic_width=64, pic_height=48,
        quality=40,
    )
    enc = Encoder(info)
    enc.keyframe_freq = 4
    enc.flush_headers()
    h = hashlib.sha256()
    for fr in frames:
        h.update(enc.encode_frame(fr).data)
    # (q40 sits below the adaptive-quant "auto" gate, so the round-3
    # masking default leaves this digest untouched.)
    assert h.hexdigest() == (
        "311b6ffa5060c5b57d148c21fe6d2e026c1dd5ac96f6f1ebc5a96b6f72d6ef17"
    )


def test_fast_recon_byte_identical():
    """Entropy-free closed-loop reconstruction must produce byte-identical
    streams to the decode-the-packet loop."""
    frames = _load_clip("clip64x48.i420", 64, 48)[:6]
    outs = []
    for fast in (False, True):
        info = TheoraInfo(
            frame_width=64, frame_height=48, pic_width=64, pic_height=48,
            quality=40,
        )
        enc = Encoder(info)
        enc.keyframe_freq = 4
        enc.fast_recon = fast
        enc.flush_headers()
        outs.append([enc.encode_frame(fr).data for fr in frames])
    assert outs[0] == outs[1]


def test_speed_levels():
    """TH_ENCCTL_SET_SPLEVEL semantics (encint.h:216-227): every level
    0-4 produces streams both decoders accept bit-identically; level 1
    (early skip) is outcome-identical to level 0 (its threshold is a
    strict subset of the full R/D skip rule); level >=2 disables the
    4MV mode; level 4 emits no motion vectors at all."""
    import subprocess
    import tempfile

    from tests.conftest import ensure_ref_oracle
    from theora_tpu.constants import (
        MODE_INTER_MV, MODE_INTER_MV_FOUR, MODE_INTER_MV_LAST,
        MODE_INTER_MV_LAST2, MODE_GOLDEN_MV,
    )
    from theora_tpu.tpkt import write_tpkt

    have_oracle = ensure_ref_oracle()
    frames = _load_clip("clip64x48.i420", 64, 48)[:8]
    info = TheoraInfo(
        frame_width=64, frame_height=48, pic_width=64, pic_height=48,
        quality=40,
    )
    streams = {}
    for lvl in range(5):
        enc = Encoder(info)
        enc.keyframe_freq = 4
        enc.set_splevel(lvl)
        hdrs = enc.flush_headers()
        pkts = [enc.encode_frame(fr) for fr in frames]
        streams[lvl] = pkts
        pinfo = parse_info_header(hdrs[0].data)
        psetup = parse_setup_header(hdrs[2].data)
        dec = Decoder(pinfo, psetup)
        tdec = Decoder(pinfo, psetup)  # telemetry paints output pixels
        tdec.set_telemetry(mv=1)
        mv_modes = set()
        got_mv = False
        ours = []
        for p in pkts:
            dec.decode_packet(p.data)
            tdec.decode_packet(p.data)
            ours.append(
                np.concatenate([pl.reshape(-1) for pl in dec.ycbcr_out()])
            )
            st = tdec._telemetry_state
            if st is not None:
                mv_modes |= set(np.unique(st["mode"]).tolist())
                if st["mv"] is not None and np.abs(st["mv"]).max() > 0:
                    got_mv = True
        if lvl >= 2:
            assert MODE_INTER_MV_FOUR not in mv_modes, lvl
        if lvl >= 4:
            assert not got_mv and not mv_modes & {
                MODE_INTER_MV, MODE_INTER_MV_FOUR, MODE_INTER_MV_LAST,
                MODE_INTER_MV_LAST2, MODE_GOLDEN_MV,
            }, lvl
        if have_oracle:
            with tempfile.TemporaryDirectory() as td:
                tp = os.path.join(td, "s.tpkt")
                yv = os.path.join(td, "s.yuv")
                write_tpkt(tp, hdrs + pkts)
                from tests.conftest import REPO_ROOT

                r = subprocess.run(
                    [os.path.join(REPO_ROOT, "refbuild", "build", "ref_dec"),
                     tp, yv],
                    capture_output=True, text=True,
                )
                assert r.returncode == 0, (lvl, r.stderr)
                ref = np.fromfile(yv, np.uint8).reshape(len(frames), -1)
                for i in range(len(frames)):
                    assert np.array_equal(ours[i], ref[i]), (lvl, i)
    assert [p.data for p in streams[0]] == [p.data for p in streams[1]]
