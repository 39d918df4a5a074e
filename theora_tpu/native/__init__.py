"""Native (C++) entropy tier: builds and loads the shared library on demand
via ctypes. Falls back to the pure-Python tier when unavailable."""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "build", "libtheora_entropy.so")
_SRC = os.path.join(_DIR, "entropy.cpp")

_lib = None


_TAG = _SO + ".buildinfo"


def _build() -> None:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    # Tuned build for the local CPU, portable fallback. The .buildinfo tag
    # pins the flags + host so every machine compiles its own binary once
    # (a checked-out .so from another machine is never trusted).
    for flags in (
        ["-O3", "-march=native", "-fno-math-errno", "-pthread"],
        ["-O3", "-pthread"],
        ["-O3"],
    ):
        try:
            subprocess.run(
                ["g++", *flags, "-shared", "-fPIC", "-std=c++17", _SRC,
                 "-o", _SO],
                check=True,
                capture_output=True,
            )
            with open(_TAG, "w") as f:
                f.write(" ".join(flags) + " " + os.uname().nodename)
            return
        except subprocess.CalledProcessError:
            continue
    raise RuntimeError("native build failed")


def _tag_current() -> bool:
    try:
        with open(_TAG) as f:
            return f.read().split()[-1] == os.uname().nodename
    except OSError:
        return False


def get_lib():
    """Load (building if needed) the native entropy library, or None."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if (
            not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            or not _tag_current()
        ):
            _build()
        lib = ctypes.CDLL(_SO)
    except Exception:
        return None
    lib.th_entropy_create.restype = ctypes.c_void_p
    lib.th_entropy_create.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.th_entropy_destroy.argtypes = [ctypes.c_void_p]
    lib.th_decode_frame_tokens.restype = ctypes.c_int64
    lib.th_decode_frame_tokens.argtypes = [
        ctypes.c_void_p,  # ctx
        ctypes.c_void_p,  # packet
        ctypes.c_int64,   # packet_len
        ctypes.c_int64,   # bit_offset
        ctypes.c_void_p,  # ncoded[3]
        ctypes.c_void_p,  # qcoeffs out
        ctypes.c_void_p,  # last_zzi out
        ctypes.c_void_p,  # dc out
        ctypes.c_void_p,  # frag_bits out (nullable)
    ]
    lib.th_encode_frame_tokens.restype = ctypes.c_int64
    lib.th_encode_frame_tokens.argtypes = [
        ctypes.c_void_p,  # vecs
        ctypes.c_void_p,  # ncoded[3]
        ctypes.c_void_p,  # huff_codes
        ctypes.c_void_p,  # prefix
        ctypes.c_int64,   # prefix_bits
        ctypes.c_void_p,  # out
        ctypes.c_int64,   # cap
    ]
    _lib = lib
    return _lib



def _require_lib():
    """get_lib() or a clean RuntimeError (for module-level helpers whose
    callers expect an ImportError-like failure, not AttributeError on
    None)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native entropy library unavailable")
    return lib

class NativeEntropy:
    """ctypes wrapper around the C++ entropy codec."""

    def __init__(self, codebooks):
        """codebooks: list of 80 Codebook objects (theora_tpu.huffman)."""
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native entropy library unavailable")
        self._lib = lib
        codes = np.zeros((80, 32, 3), dtype=np.int32)
        ncodes = np.zeros(80, dtype=np.int32)
        for b, book in enumerate(codebooks):
            for i, (t, p, n) in enumerate(book.codes):
                codes[b, i] = (t, p, n)
            ncodes[b] = len(book.codes)
        self._codes = np.ascontiguousarray(codes)
        self._ncodes = np.ascontiguousarray(ncodes)
        self._ctx = lib.th_entropy_create(
            self._codes.ctypes.data, self._ncodes.ctypes.data
        )

    def __del__(self):
        if getattr(self, "_ctx", None):
            self._lib.th_entropy_destroy(self._ctx)
            self._ctx = None

    def decode_frame_tokens(self, packet: bytes, bit_offset: int, ncoded,
                            want_bits=False):
        """Returns (qcoeffs [total,64] int16 zig-zag, last_zzi [total],
        dc [total], end_bitpos[, frag_bits [total]])."""
        total = int(sum(ncoded))
        nc = np.asarray(ncoded, dtype=np.int64)
        qcoeffs = np.zeros((max(total, 1), 64), dtype=np.int16)
        last_zzi = np.zeros(max(total, 1), dtype=np.int32)
        dc = np.zeros(max(total, 1), dtype=np.int32)
        fbits = np.zeros(max(total, 1), dtype=np.int32) if want_bits else None
        buf = np.frombuffer(packet, dtype=np.uint8)
        end = self._lib.th_decode_frame_tokens(
            self._ctx,
            buf.ctypes.data,
            len(packet),
            bit_offset,
            nc.ctypes.data,
            qcoeffs.ctypes.data,
            last_zzi.ctypes.data,
            dc.ctypes.data,
            fbits.ctypes.data if want_bits else None,
        )
        if end < 0:
            raise ValueError("native token decode failed")
        if want_bits:
            return (qcoeffs[:total], last_zzi[:total], dc[:total], int(end),
                    fbits[:total])
        return qcoeffs[:total], last_zzi[:total], dc[:total], int(end)


class NativeTokenPacker:
    """Encode-side: tokenize + residual section packing in C++."""

    def __init__(self, huff_codes):
        """huff_codes: [80][32] of (pattern, nbits)."""
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native entropy library unavailable")
        self._lib = lib
        arr = np.zeros((80, 32, 2), dtype=np.int32)
        for b in range(80):
            for t in range(32):
                arr[b, t] = huff_codes[b][t]
        self._codes = np.ascontiguousarray(arr)

    def pack_frame_trellis(self, paths, dc, ncoded, prefix: bytes,
                           prefix_bits: int):
        """Replay trellis plans (phase 2) + pack; returns (packet_bytes,
        [dc_y, dc_c, ac_y, ac_c] chosen Huffman indices)."""
        lib = self._lib
        if not hasattr(lib, "_tp_setup"):
            lib.th_encode_frame_trellis.restype = ctypes.c_int64
            lib.th_encode_frame_trellis.argtypes = [ctypes.c_void_p] * 4 + [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_void_p,
            ]
            lib._tp_setup = True
        paths = np.ascontiguousarray(paths, dtype=np.int16)
        dc32 = np.ascontiguousarray(dc, dtype=np.int32)
        nc = np.asarray(ncoded, dtype=np.int64)
        cap = 64 + prefix_bits // 8 + max(paths.size, 64) * 4
        out = np.zeros(cap, dtype=np.uint8)
        pre = np.frombuffer(prefix, dtype=np.uint8) if prefix else np.zeros(1, np.uint8)
        chosen = np.zeros(4, dtype=np.int32)
        n = lib.th_encode_frame_trellis(
            paths.ctypes.data, dc32.ctypes.data, nc.ctypes.data,
            self._codes.ctypes.data, pre.ctypes.data, prefix_bits,
            out.ctypes.data, cap, chosen.ctypes.data,
        )
        if n < 0:
            raise ValueError("native trellis pack failed")
        return out[:n].tobytes(), [int(x) for x in chosen]

    def pack_frame_trellis_perm(self, paths3, perm3, dc3, prefix: bytes,
                                prefix_bits: int):
        """Permuted phase-2 pack: per-plane plan arrays in quantize order
        + scan->raster permutations + per-plane scan-order DC values."""
        lib = self._lib
        if not hasattr(lib, "_tpp_setup"):
            lib.th_encode_frame_trellis_perm.restype = ctypes.c_int64
            lib.th_encode_frame_trellis_perm.argtypes = (
                [ctypes.c_void_p] * 9
                + [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                   ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
                   ctypes.c_void_p]
            )
            lib._tpp_setup = True
        paths = [np.ascontiguousarray(p, dtype=np.int16) for p in paths3]
        perms = [np.ascontiguousarray(p, dtype=np.int32) for p in perm3]
        dcs = [np.ascontiguousarray(d, dtype=np.int32) for d in dc3]
        nc = np.asarray([len(p) for p in perms], dtype=np.int64)
        total = int(nc.sum())
        cap = 64 + prefix_bits // 8 + max(total * 80, 512)
        out = np.zeros(cap, dtype=np.uint8)
        pre = (np.frombuffer(prefix, dtype=np.uint8)
               if prefix else np.zeros(1, np.uint8))
        chosen = np.zeros(4, dtype=np.int32)
        # Empty planes still need valid pointers.
        zp = np.zeros((1, 66, 4), np.int16)
        zi = np.zeros(1, np.int32)
        n = lib.th_encode_frame_trellis_perm(
            *[(p if len(p) else zp).ctypes.data for p in paths],
            *[(p if len(p) else zi).ctypes.data for p in perms],
            *[(d if len(d) else zi).ctypes.data for d in dcs],
            nc.ctypes.data, self._codes.ctypes.data, pre.ctypes.data,
            prefix_bits, out.ctypes.data, cap, chosen.ctypes.data,
        )
        if n < 0:
            raise ValueError("native trellis pack failed")
        return out[:n].tobytes(), [int(x) for x in chosen]

    def pack_frame(self, vecs: np.ndarray, ncoded, prefix: bytes, prefix_bits: int) -> bytes:
        vecs = np.ascontiguousarray(vecs, dtype=np.int16)
        nc = np.asarray(ncoded, dtype=np.int64)
        cap = 64 + prefix_bits // 8 + vecs.size * 4
        out = np.zeros(cap, dtype=np.uint8)
        pre = np.frombuffer(prefix, dtype=np.uint8) if prefix else np.zeros(1, np.uint8)
        n = self._lib.th_encode_frame_tokens(
            vecs.ctypes.data,
            nc.ctypes.data,
            self._codes.ctypes.data,
            pre.ctypes.data,
            prefix_bits,
            out.ctypes.data,
            cap,
        )
        if n < 0:
            raise ValueError("native token pack failed")
        return out[:n].tobytes()


def _setup_filters(lib):
    lib.th_dc_predict_plane.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.th_loop_filter_plane.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
    ]


def pp_postprocess_plane():
    """Native out-of-loop postprocessor (deblock + dering): returns a
    callable with the signature of ops.postproc_np.postprocess_plane,
    or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    if not getattr(lib, "_pp_setup", False):
        lib.th_pp_deblock_plane.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.th_pp_dering_plane.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ]
        lib._pp_setup = True

    def run(src, dc_qis, qi_per_frag, dc_scale_table, sharp_table,
            dering, strong, pli):
        h, w = src.shape
        nv, nh = h >> 3, w >> 3
        src = np.ascontiguousarray(src)
        dst = np.empty_like(src)
        variances = np.empty(nv * nh, dtype=np.int32)
        dqs = np.ascontiguousarray(dc_qis, dtype=np.uint8)
        scale = np.ascontiguousarray(dc_scale_table, dtype=np.int32)
        lib.th_pp_deblock_plane(
            dst.ctypes.data, w, src.ctypes.data, w, w, h, nh, nv,
            dqs.ctypes.data, scale.ctypes.data, variances.ctypes.data)
        if dering:
            qpf = np.ascontiguousarray(qi_per_frag, dtype=np.uint8)
            sharp = np.ascontiguousarray(sharp_table, dtype=np.int32)
            lib.th_pp_dering_plane(
                dst.ctypes.data, w, w, h, nh, nv, qpf.ctypes.data,
                scale.ctypes.data, sharp.ctypes.data, variances.ctypes.data,
                1 if strong else 0, pli)
        return dst

    return run


def dc_predict_native(mode, coded, refi, dc, pred_last):
    """mode 0: decode (dc updated in place); mode 1: encode (returns
    residuals). pred_last: length-3 list, updated in place."""
    lib = _require_lib()
    if not hasattr(lib, "_filters_setup"):
        _setup_filters(lib)
        lib._filters_setup = True
    nv, nh = coded.shape
    coded8 = np.ascontiguousarray(coded, dtype=np.uint8)
    refi32 = np.ascontiguousarray(refi, dtype=np.int32)
    dc32 = np.ascontiguousarray(dc, dtype=np.int32)
    out = np.zeros((nv, nh), dtype=np.int32)
    pl = np.asarray(pred_last, dtype=np.int32)
    lib.th_dc_predict_plane(
        mode, nv, nh, coded8.ctypes.data, refi32.ctypes.data,
        dc32.ctypes.data, out.ctypes.data, pl.ctypes.data,
    )
    pred_last[:] = pl.tolist()
    if mode == 0:
        dc[...] = dc32
        return None
    return out


def loop_filter_native(plane, coded, bv, pad_y, pad_x=None):
    if pad_x is None:
        pad_x = pad_y
    lib = _require_lib()
    if not hasattr(lib, "_filters_setup"):
        _setup_filters(lib)
        lib._filters_setup = True
    nv, nh = coded.shape
    coded8 = np.ascontiguousarray(coded, dtype=np.uint8)
    bv32 = np.ascontiguousarray(bv, dtype=np.int32)
    assert plane.flags["C_CONTIGUOUS"]
    lib.th_loop_filter_plane(
        plane.ctypes.data, plane.shape[1], pad_y, pad_x, nv, nh,
        coded8.ctypes.data, bv32.ctypes.data,
    )


def residuals_native(qz, deq_rows, dc, dc_quant, dc_only):
    """Batched dequant + bit-exact iDCT (+ DC-fill path) in C++.

    qz: [n,64] int zig-zag quantized; deq_rows: [n,64]; dc/dc_quant: [n];
    dc_only: [n] bool. Returns [n,8,8] int32 residuals.
    """
    lib = _require_lib()
    if not hasattr(lib, "_resid_setup"):
        lib.th_residuals_batch.argtypes = [
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib._resid_setup = True
    n = len(qz)
    qz16 = np.ascontiguousarray(qz, dtype=np.int16)
    deq32 = np.ascontiguousarray(deq_rows, dtype=np.int32)
    dc32 = np.ascontiguousarray(dc, dtype=np.int32)
    dq32 = np.ascontiguousarray(dc_quant, dtype=np.int32)
    do8 = np.ascontiguousarray(dc_only, dtype=np.uint8)
    out = np.empty((n, 64), dtype=np.int32)
    lib.th_residuals_batch(
        n, qz16.ctypes.data, deq32.ctypes.data, dc32.ctypes.data,
        dq32.ctypes.data, do8.ctypes.data, out.ctypes.data,
    )
    return out.reshape(n, 8, 8)


def recon_plane_native(self_plane, prev_plane, gold_plane, vpad, hpad,
                       fy, fx, refi, mvx, mvy, residual, qpx, qpy, ufy, ufx):
    lib = _require_lib()
    if not hasattr(lib, "_recon_setup"):
        lib.th_recon_plane.argtypes = [ctypes.c_void_p] * 3 + [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib._recon_setup = True
    a = lambda x, dt: np.ascontiguousarray(x, dtype=dt)
    fy32, fx32 = a(fy, np.int32), a(fx, np.int32)
    refi32 = a(refi, np.int32)
    mvx32, mvy32 = a(mvx, np.int32), a(mvy, np.int32)
    res32 = a(residual.reshape(len(residual), 64) if len(residual) else residual, np.int32)
    ufy32, ufx32 = a(ufy, np.int32), a(ufx, np.int32)
    assert self_plane.flags["C_CONTIGUOUS"]
    lib.th_recon_plane(
        self_plane.ctypes.data, prev_plane.ctypes.data, gold_plane.ctypes.data,
        self_plane.shape[1], vpad, hpad, len(fy32),
        fy32.ctypes.data, fx32.ctypes.data, refi32.ctypes.data,
        mvx32.ctypes.data, mvy32.ctypes.data, res32.ctypes.data,
        qpx, qpy, len(ufy32), ufy32.ctypes.data, ufx32.ctypes.data,
    )


def sad_halfpel_native(cur, ref, y, x, pad, mvx, mvy, bs=16):
    lib = _require_lib()
    if not hasattr(lib, "_sad_setup"):
        lib.th_sad_halfpel.restype = ctypes.c_int64
        lib.th_sad_halfpel.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        lib._sad_setup = True
    return lib.th_sad_halfpel(
        cur.ctypes.data, cur.shape[1], ref.ctypes.data, ref.shape[1],
        y, x, pad, mvx, mvy, bs,
    )


def _me_setup(lib):
    common = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
    ]
    lib.th_me_fullpel.argtypes = common + [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
    ]
    lib.th_me_propagate.argtypes = common + [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    lib.th_me_halfpel.argtypes = common + [
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.th_me_refine.argtypes = common + [
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_int,
    ]


def motion_estimate_native(cur, ref_padded, mb_y, mb_x, max_mv=15, iters=2):
    """Full ME: pyramid full-pel + propagation + half-pel (16x16 MBs).
    Returns (mvs [n,2] half-pel (dx,dy), sads [n])."""
    lib = _require_lib()
    if not hasattr(lib, "_me_setup_done"):
        _me_setup(lib)
        lib._me_setup_done = True
    cur = np.ascontiguousarray(cur)
    ref = np.ascontiguousarray(ref_padded)
    H, W = cur.shape
    pad = (ref.shape[0] - H) // 2
    n = len(mb_y)
    by = np.ascontiguousarray(mb_y, dtype=np.int32)
    bx = np.ascontiguousarray(mb_x, dtype=np.int32)
    mvs = np.zeros((n, 2), dtype=np.int32)
    sads = np.zeros(n, dtype=np.int64)
    args = (cur.ctypes.data, W, H, ref.ctypes.data, pad,
            by.ctypes.data, bx.ctypes.data, n)
    lib.th_me_fullpel(*args, mvs.ctypes.data, sads.ctypes.data, max_mv)
    lib.th_me_propagate(*args, mvs.ctypes.data, sads.ctypes.data, max_mv, iters)
    lib.th_me_halfpel(*args, 16, mvs.ctypes.data, sads.ctypes.data)
    return mvs, sads


def me_block_refine_native(cur, ref_padded, by, bx, seed_mvs, bs=8):
    """Per-block refine + half-pel for the 4MV path (seed = MB full-pel
    MV)."""
    lib = _require_lib()
    if not hasattr(lib, "_me_setup_done"):
        _me_setup(lib)
        lib._me_setup_done = True
    cur = np.ascontiguousarray(cur)
    ref = np.ascontiguousarray(ref_padded)
    H, W = cur.shape
    pad = (ref.shape[0] - H) // 2
    n = len(by)
    by32 = np.ascontiguousarray(by, dtype=np.int32)
    bx32 = np.ascontiguousarray(bx, dtype=np.int32)
    mvs = np.ascontiguousarray(seed_mvs, dtype=np.int32).copy()
    sads = np.zeros(n, dtype=np.int64)
    args = (cur.ctypes.data, W, H, ref.ctypes.data, pad,
            by32.ctypes.data, bx32.ctypes.data, n)
    lib.th_me_refine(*args, bs, mvs.ctypes.data, sads.ctypes.data, 15, 1)
    lib.th_me_halfpel(*args, bs, mvs.ctypes.data, sads.ctypes.data)
    return mvs, sads


def fdct_quantize_rd_native(res_blocks, dequant_zz, lam, rd=True,
                            want_dct=False):
    """fDCT + (R/D) quantization in C++.

    res_blocks: [n, 8, 8] int; dequant_zz: [64]; returns
    (qz [n,64] int16, err2 [n] int64, res2 [n] int64) plus the raw
    zig-zag DCT [n,64] int16 when want_dct (for the trellis tokenizer).
    """
    lib = _require_lib()
    if not hasattr(lib, "_fq_setup"):
        lib.th_fdct_quantize_rd.argtypes = [
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_double, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib._fq_setup = True
    n = len(res_blocks)
    res32 = np.ascontiguousarray(res_blocks.reshape(n, 64), dtype=np.int32)
    dq32 = np.ascontiguousarray(dequant_zz, dtype=np.int32)
    qz = np.empty((n, 64), dtype=np.int16)
    err2 = np.empty(n, dtype=np.int64)
    res2 = np.empty(n, dtype=np.int64)
    dct = np.empty((n, 64), dtype=np.int16) if want_dct else None
    lib.th_fdct_quantize_rd(
        n, res32.ctypes.data, dq32.ctypes.data, float(lam), int(rd),
        qz.ctypes.data, err2.ctypes.data, res2.ctypes.data,
        dct.ctypes.data if want_dct else None,
    )
    if want_dct:
        return qz, err2, res2, dct
    return qz, err2, res2


def mode_decide_fill_native(cur, ref_padded, mb_list, mb_fy, mb_fx,
                            sad_nomv, sad_gold, sad_intra, sad_mv, sad_4mv,
                            mvs, bmvs, mb_maps, pixel_fmt, mv_bits_sad,
                            nfrags, bias_scale=1.0):
    """Sequential mode decision + per-fragment fill in C++.

    Returns (mb_modes [n], mb_mvs [n,2], refi [nfrags], mode [nfrags],
    mv [nfrags,2])."""
    lib = _require_lib()
    if not hasattr(lib, "_md_setup"):
        lib.th_mode_decide_fill.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int64,
        ] + [ctypes.c_void_p] * 11 + [
            ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ] + [ctypes.c_void_p] * 5
        lib._md_setup = True
    cur = np.ascontiguousarray(cur)
    ref = np.ascontiguousarray(ref_padded)
    H, W = cur.shape
    pad = (ref.shape[0] - H) // 2
    n = len(mb_list)
    a = lambda x, dt: np.ascontiguousarray(x, dtype=dt)
    mb_modes = np.zeros(n, dtype=np.int32)
    mb_mvs = np.zeros((n, 2), dtype=np.int32)
    refi = np.full(nfrags, 3, dtype=np.int32)
    fmode = np.zeros(nfrags, dtype=np.int32)
    fmv = np.zeros((nfrags, 2), dtype=np.int32)
    # Bind every converted array to a local so it outlives the call.
    arrs = [
        a(mb_list, np.int32), a(mb_fy, np.int32), a(mb_fx, np.int32),
        a(sad_nomv, np.int64), a(sad_gold, np.int64),
        a(sad_intra, np.int64), a(sad_mv, np.int64), a(sad_4mv, np.int64),
        a(mvs, np.int32), a(bmvs, np.int32),
        a(mb_maps.reshape(-1), np.int32),
    ]
    lib.th_mode_decide_fill(
        cur.ctypes.data, W, H, ref.ctypes.data, pad, n,
        *[x.ctypes.data for x in arrs],
        int(pixel_fmt), float(mv_bits_sad), float(bias_scale),
        mb_modes.ctypes.data, mb_mvs.ctypes.data, refi.ctypes.data,
        fmode.ctypes.data, fmv.ctypes.data,
    )
    return mb_modes, mb_mvs, refi, fmode, fmv


def trellis_plan_blocks_native(dct16, qdct, dq0, dq1, qti, lam, nbt):
    """Phase-1 trellis planning in C++ (th_trellis_plan_blocks).

    dct16 [n,64] int16; qdct [n,64] int16 (AC rewritten in place); dq0/dq1
    [64] dequant rows; qti [n] 0/1; nbt [5,32] int64 bit costs. Returns
    (paths [n,66,4] int16, acbits [n] int64, err2 [n] int64).
    """
    lib = _require_lib()
    if not hasattr(lib, "_tpl_setup"):
        lib.th_trellis_plan_blocks.argtypes = [
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.th_trellis_plan_blocks_lam.argtypes = [
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib._tpl_setup = True
    n = len(qdct)
    dct_c = np.ascontiguousarray(dct16, dtype=np.int16)
    assert qdct.dtype == np.int16 and qdct.flags.c_contiguous
    dq0_c = np.ascontiguousarray(dq0, dtype=np.int32)
    dq1_c = np.ascontiguousarray(dq1, dtype=np.int32)
    qti_c = np.ascontiguousarray(qti, dtype=np.int32)
    nbt_c = np.ascontiguousarray(nbt, dtype=np.int64)
    paths = np.empty((n, 66, 4), dtype=np.int16)
    acbits = np.empty(n, dtype=np.int64)
    err2 = np.empty(n, dtype=np.int64)
    if isinstance(lam, np.ndarray):
        # Per-block lambda (activity masking): one lambda per block.
        lam_c = np.ascontiguousarray(
            np.rint(lam).astype(np.int64)
        )
        assert len(lam_c) == n
        lib.th_trellis_plan_blocks_lam(
            n, dct_c.ctypes.data, qdct.ctypes.data, dq0_c.ctypes.data,
            dq1_c.ctypes.data, qti_c.ctypes.data, lam_c.ctypes.data,
            nbt_c.ctypes.data, acbits.ctypes.data, err2.ctypes.data,
            paths.ctypes.data,
        )
    else:
        lib.th_trellis_plan_blocks(
            n, dct_c.ctypes.data, qdct.ctypes.data, dq0_c.ctypes.data,
            dq1_c.ctypes.data, qti_c.ctypes.data, int(lam),
            nbt_c.ctypes.data, acbits.ctypes.data, err2.ctypes.data,
            paths.ctypes.data,
        )
    return paths, acbits, err2


def quantize_estimate_native(dct16, dq, dq_dc, lam, nbt):
    """Quantize (round-to-nearest + the cheap R/D sweeps of
    th_fdct_quantize_rd) and price with a greedy tokenization bit
    estimate (th_quantize_estimate): the cost model behind the
    estimate-first qii chooser.  dct16 [n,64] int16 (zig-zag); dq [64]
    int32 AC row; dq_dc the base qi's DC quant; lam the R/D lambda
    (0 = plain round-to-nearest); nbt [5,32] int64 bit costs.  Returns
    (qz [n,64] int16, bits [n] int64, err [n] int64)."""
    lib = _require_lib()
    if not hasattr(lib, "_qe_setup"):
        lib.th_quantize_estimate.argtypes = [
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int32, ctypes.c_double, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib._qe_setup = True
    n = len(dct16)
    dct_c = np.ascontiguousarray(dct16, dtype=np.int16)
    dq_c = np.ascontiguousarray(dq, dtype=np.int32)
    nbt_c = np.ascontiguousarray(nbt, dtype=np.int64)
    qz = np.empty((n, 64), dtype=np.int16)
    bits = np.empty(n, dtype=np.int64)
    err = np.empty(n, dtype=np.int64)
    lib.th_quantize_estimate(
        n, dct_c.ctypes.data, dq_c.ctypes.data, int(dq_dc), float(lam),
        nbt_c.ctypes.data, qz.ctypes.data, bits.ctypes.data,
        err.ctypes.data,
    )
    return qz, bits, err


def sad_batch_native(cur, ref_padded, fy, fx, mvx, mvy, bs=16):
    """Batch half-pel SAD (th_sad_batch). cur [H,W]; ref padded; fy/fx
    block pixel coords; mvx/mvy half-pel MVs. Returns [n] int64."""
    lib = _require_lib()
    if not hasattr(lib, "_sb_setup"):
        lib.th_sad_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
        ]
        lib._sb_setup = True
    cur = np.ascontiguousarray(cur)
    ref = np.ascontiguousarray(ref_padded)
    W = cur.shape[1]
    pad = (ref.shape[1] - W) // 2
    n = len(fy)
    arrs = [np.ascontiguousarray(x, dtype=np.int32) for x in (fy, fx, mvx, mvy)]
    out = np.empty(n, dtype=np.int64)
    lib.th_sad_batch(
        cur.ctypes.data, W, ref.ctypes.data, pad, n,
        *[x.ctypes.data for x in arrs], int(bs), out.ctypes.data,
    )
    return out


def enc_residuals_native(cur, prev_padded, gold_padded, fy, fx, refsel,
                         o1y, o1x, o2y, o2x, use2, vpad, hpad):
    """MC residual gather for the encoder (th_enc_residuals). Returns
    [n, 8, 8] int32 = cur - prediction."""
    lib = _require_lib()
    if not hasattr(lib, "_er_setup"):
        lib.th_enc_residuals.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int64,
        ] + [ctypes.c_void_p] * 8 + [
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ]
        lib._er_setup = True
    cur = np.ascontiguousarray(cur)
    prev = np.ascontiguousarray(prev_padded)
    gold = np.ascontiguousarray(gold_padded)
    n = len(fy)
    ints = [np.ascontiguousarray(x, dtype=np.int32)
            for x in (fy, fx, refsel, o1y, o1x, o2y, o2x)]
    u8 = np.ascontiguousarray(use2, dtype=np.uint8)
    out = np.empty((n, 8, 8), dtype=np.int32)
    lib.th_enc_residuals(
        cur.ctypes.data, cur.shape[1], prev.ctypes.data, gold.ctypes.data,
        prev.shape[1], n, *[x.ctypes.data for x in ints], u8.ctypes.data,
        int(vpad), int(hpad), out.ctypes.data,
    )
    return out


def coded_flags_pack_native(coded, scan_fragis, scan_sbi, nsbs):
    """Pack the coded-block-flags section (th_coded_flags_pack). Returns
    (bitbuf bytes, nbits, sb_partial bool[nsbs])."""
    lib = _require_lib()
    if not hasattr(lib, "_cf_setup"):
        lib.th_coded_flags_pack.restype = ctypes.c_int64
        lib.th_coded_flags_pack.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p,
        ]
        lib._cf_setup = True
    c8 = np.ascontiguousarray(coded, dtype=np.uint8)
    sf = np.ascontiguousarray(scan_fragis, dtype=np.int32)
    sb = np.ascontiguousarray(scan_sbi, dtype=np.int32)
    nscan = len(sf)
    cap = 64 + nscan + nsbs
    out = np.zeros(cap, dtype=np.uint8)
    part = np.zeros(nsbs, dtype=np.uint8)
    bits = lib.th_coded_flags_pack(
        c8.ctypes.data, sf.ctypes.data, sb.ctypes.data, nscan, int(nsbs),
        out.ctypes.data, cap, part.ctypes.data,
    )
    if bits < 0:
        raise ValueError("coded flags pack failed")
    return out.tobytes(), int(bits), part.astype(bool)


def hadamard_batch_native(res_blocks):
    """SATD (8x8 Hadamard, DC excluded) of residual blocks [n, 8, 8] or
    [n, 64]. Returns (satd [n] int64, dc [n] int32)."""
    lib = _require_lib()
    if not hasattr(lib, "_hb_setup"):
        lib.th_hadamard_batch.argtypes = [
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib._hb_setup = True
    n = len(res_blocks)
    res32 = np.ascontiguousarray(res_blocks.reshape(n, 64), dtype=np.int32)
    satd = np.empty(n, dtype=np.int64)
    dc = np.empty(n, dtype=np.int32)
    lib.th_hadamard_batch(n, res32.ctypes.data, satd.ctypes.data,
                          dc.ctypes.data)
    return satd, dc


def satd_halfpel_batch_native(cur, ref_padded, fy, fx, mvx, mvy, bs=16):
    """Batch half-pel SATD (th_satd_halfpel_batch); bs=16 sums the four
    8x8 SATDs of a macroblock. Returns (satd [n] int64, dc [n] int32)."""
    lib = _require_lib()
    if not hasattr(lib, "_shb_setup"):
        lib.th_satd_halfpel_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib._shb_setup = True
    cur = np.ascontiguousarray(cur)
    ref = np.ascontiguousarray(ref_padded)
    W = cur.shape[1]
    pad = (ref.shape[1] - W) // 2
    n = len(fy)
    arrs = [np.ascontiguousarray(x, dtype=np.int32)
            for x in (fy, fx, mvx, mvy)]
    satd = np.empty(n, dtype=np.int64)
    dc = np.empty(n, dtype=np.int32)
    lib.th_satd_halfpel_batch(
        cur.ctypes.data, W, ref.ctypes.data, pad, n,
        *[x.ctypes.data for x in arrs], int(bs),
        satd.ctypes.data, dc.ctypes.data,
    )
    return satd, dc


def mb_modes_pack_native(modes, alphabets):
    """Scheme selection + MB mode emission (th_mb_modes_pack). Returns
    (bitbuf bytes, nbits)."""
    lib = _require_lib()
    if not hasattr(lib, "_mm_setup"):
        lib.th_mb_modes_pack.restype = ctypes.c_int64
        lib.th_mb_modes_pack.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64,
        ]
        lib._mm_setup = True
    m32 = np.ascontiguousarray(modes, dtype=np.int32)
    al = np.ascontiguousarray(alphabets, dtype=np.int32)
    cap = 16 + len(m32) * 2
    out = np.zeros(cap, dtype=np.uint8)
    bits = lib.th_mb_modes_pack(
        m32.ctypes.data, len(m32), al.ctypes.data, out.ctypes.data, cap
    )
    if bits < 0:
        raise ValueError("mb modes pack failed")
    return out.tobytes(), int(bits)


def mode_decide_native(mb_list, mb_row, mb_col, mb_all4, mb_birc,
                       mv, sad_mv, sad_nomv, sad_gold, sad_intra,
                       cands, cand_sads, gmv, sad_gmv, bmv, bsad,
                       nmbs, b, mvb, no_mc):
    """Sequential LAST/LAST2-aware mode decision (th_mode_decide), the
    C++ twin of TpuGopEncoder._decide_frame's Python walk -- identical
    costs (IEEE doubles), identical tie order.  Returns
    (mb_modes [nmbs] i32, mb_mvs [nmbs, 2] i32, mb_bmvs [nmbs, 4, 2])."""
    lib = _require_lib()
    if not hasattr(lib, "_md_walk_setup"):
        lib.th_mode_decide.restype = None
        lib.th_mode_decide.argtypes = (
            [ctypes.c_int64] + [ctypes.c_void_p] * 16
            + [ctypes.c_int64] * 3
            + [ctypes.c_double, ctypes.c_double, ctypes.c_int32]
            + [ctypes.c_void_p] * 3
        )
        lib._md_walk_setup = True
    nv, nh = sad_mv.shape
    K = cands.shape[0]
    c32 = lambda a: np.ascontiguousarray(a, dtype=np.int32)
    mb_list = c32(mb_list)
    arrs = [c32(x) for x in (mb_row, mb_col)]
    all4 = np.ascontiguousarray(mb_all4, dtype=np.uint8)
    birc = c32(mb_birc)
    ins = [c32(x) for x in (mv, sad_mv, sad_nomv, sad_gold, sad_intra,
                            cands, cand_sads, gmv, sad_gmv, bmv, bsad)]
    mb_modes = np.full(nmbs, -1, np.int32)
    mb_modes[mb_list] = 0
    mb_mvs = np.zeros((nmbs, 2), np.int32)
    mb_bmvs = np.zeros((nmbs, 4, 2), np.int32)
    lib.th_mode_decide(
        len(mb_list), mb_list.ctypes.data,
        arrs[0].ctypes.data, arrs[1].ctypes.data, all4.ctypes.data,
        birc.ctypes.data, *[x.ctypes.data for x in ins],
        nv, nh, K, float(b), float(mvb), int(bool(no_mc)),
        mb_modes.ctypes.data, mb_mvs.ctypes.data, mb_bmvs.ctypes.data,
    )
    return mb_modes, mb_mvs, mb_bmvs


def ssd8_plane_native(cur, prev_padded, vpad, hpad):
    """Per-8x8-block x16 SSD of a plane vs a padded reconstruction
    (th_ssd8_plane) -- the early-skip uncoded cost.  cur [h, w] u8
    (h, w multiples of 8); prev_padded [h+2*vpad, w+2*hpad] u8."""
    lib = _require_lib()
    if not hasattr(lib, "_ssd8_setup"):
        lib.th_ssd8_plane.restype = None
        lib.th_ssd8_plane.argtypes = (
            [ctypes.c_void_p] * 2 + [ctypes.c_int64] * 3
            + [ctypes.c_void_p]
        )
        lib._ssd8_setup = True
    cur = np.ascontiguousarray(cur, dtype=np.uint8)
    h, w = cur.shape
    prev_padded = np.ascontiguousarray(prev_padded, dtype=np.uint8)
    ps = prev_padded.shape[1]
    out = np.empty((h // 8) * (w // 8), np.int64)
    lib.th_ssd8_plane(
        cur.ctypes.data,
        prev_padded.ctypes.data + vpad * ps + hpad,
        h, w, ps, out.ctypes.data,
    )
    return out


def activity8_plane_native(y):
    """Per-8x8-block activity with the flat clamp (th_activity8_plane),
    the C++ twin of encoder._luma_activity."""
    lib = _require_lib()
    if not hasattr(lib, "_act8_setup"):
        lib.th_activity8_plane.restype = None
        lib.th_activity8_plane.argtypes = (
            [ctypes.c_void_p] + [ctypes.c_int64] * 2 + [ctypes.c_void_p]
        )
        lib._act8_setup = True
    y = np.ascontiguousarray(y, dtype=np.uint8)
    h, w = y.shape
    out = np.empty((h // 8) * (w // 8), np.int64)
    lib.th_activity8_plane(y.ctypes.data, h, w, out.ctypes.data)
    return out
