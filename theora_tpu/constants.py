"""Spec-defined constant tables shared by encoder and decoder.

Values are normative (Theora spec / VP3 bitstream); layouts here are our own.
Reference locations: lib/internal.c:29-95, lib/dct.h:23-29, lib/state.h,
lib/huffman.h, lib/decode.c:52-93.
"""
from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Zig-zag scan (spec section 2.3; internal.c:29-60). ZIGZAG_TO_NAT maps a
# zig-zag index to the (row-major) coefficient index; entries >=64 land in a
# dump slot used for bogus streams with over-long runs.
ZIGZAG_TO_NAT = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ]
    + [64] * 64,
    dtype=np.int32,
)

# Inverse map: natural (row-major) coefficient index -> zig-zag index.
NAT_TO_ZIGZAG = np.zeros(64, dtype=np.int32)
NAT_TO_ZIGZAG[ZIGZAG_TO_NAT[:64]] = np.arange(64, dtype=np.int32)

# ---------------------------------------------------------------------------
# DCT constants: round(cos(n*pi/16) * 65536) (dct.h:23-29).
C1S7 = 64277
C2S6 = 60547
C3S5 = 54491
C4S4 = 46341
C5S3 = 36410
C6S2 = 25080
C7S1 = 12785

# ---------------------------------------------------------------------------
# Macro blocks / super blocks.
# Bitstream ordering of the 4 MBs inside a luma super block (internal.c:63).
MB_MAP = np.array([[0, 3], [1, 2]], dtype=np.int32)

# 4x4 Hilbert curve ordering of fragments inside a super block, as
# (macro_block_quadrant, block_index) pairs per (y, x) position
# (state.c:133-138).
SB_HILBERT = np.array(
    [
        [(0, 0), (0, 1), (3, 2), (3, 3)],
        [(0, 3), (0, 2), (3, 1), (3, 0)],
        [(1, 0), (1, 3), (2, 0), (2, 3)],
        [(1, 1), (1, 2), (2, 1), (2, 2)],
    ],
    dtype=np.int32,
)

# Per pixel-format list of valid mb_map flat indices (internal.c:67-77):
# flat index = plane_quadrant*4 + block. Plane 0 occupies indices 0-3,
# plane 1 (Cb) 4-7, plane 2 (Cr) 8-11.
MB_MAP_IDXS = {
    0: [0, 1, 2, 3, 4, 8],               # 4:2:0
    2: [0, 1, 2, 3, 4, 6, 8, 10],        # 4:2:2
    3: [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11],  # 4:4:4
}

# ---------------------------------------------------------------------------
# Coding modes (state.h:188-210).
MODE_INTER_NOMV = 0
MODE_INTRA = 1
MODE_INTER_MV = 2
MODE_INTER_MV_LAST = 3
MODE_INTER_MV_LAST2 = 4
MODE_GOLDEN_NOMV = 5
MODE_GOLDEN_MV = 6
MODE_INTER_MV_FOUR = 7
MODE_INVALID = -1
NMODES = 8

# Reference frame slots (state.h:171-184).
FRAME_GOLD = 0
FRAME_PREV = 1
FRAME_SELF = 2
FRAME_NONE = 3
FRAME_IO = 3
FRAME_GOLD_ORIG = 4
FRAME_PREV_ORIG = 5

# Which reference frame each mode predicts from (state.h:215-217).
FRAME_FOR_MODE = np.array(
    [
        FRAME_PREV,   # INTER_NOMV
        FRAME_SELF,   # INTRA
        FRAME_PREV,   # INTER_MV
        FRAME_PREV,   # INTER_MV_LAST
        FRAME_PREV,   # INTER_MV_LAST2
        FRAME_GOLD,   # GOLDEN_NOMV
        FRAME_GOLD,   # GOLDEN_MV
        FRAME_PREV,   # INTER_MV_FOUR
    ],
    dtype=np.int32,
)

# The mode alphabets for mode coding schemes 1..6 (decode.c:54-93); scheme 0
# is custom (transmitted), scheme 7 is fixed-length with the default ordering.
MODE_ALPHABETS = np.array(
    [
        [3, 4, 2, 0, 1, 5, 6, 7],
        [3, 4, 0, 2, 1, 5, 6, 7],
        [3, 2, 4, 0, 1, 5, 6, 7],
        [3, 2, 0, 4, 1, 5, 6, 7],
        [0, 3, 4, 2, 1, 5, 6, 7],
        [0, 5, 3, 4, 2, 1, 6, 7],
        [0, 1, 2, 3, 4, 5, 6, 7],
    ],
    dtype=np.int32,
)

# ---------------------------------------------------------------------------
# Unrestricted-motion-vector padding (state.h:167).
UMV_PADDING = 16

# ---------------------------------------------------------------------------
# DCT token alphabet (huffman.h:29-57). Spec token values 0..31.
NDCT_TOKENS = 32
DCT_EOB1_TOKEN = 0
DCT_EOB2_TOKEN = 1
DCT_EOB3_TOKEN = 2
DCT_REPEAT_RUN0_TOKEN = 3
DCT_REPEAT_RUN1_TOKEN = 4
DCT_REPEAT_RUN2_TOKEN = 5
DCT_REPEAT_RUN3_TOKEN = 6
DCT_SHORT_ZRL_TOKEN = 7
DCT_ZRL_TOKEN = 8
ONE_TOKEN = 9
MINUS_ONE_TOKEN = 10
TWO_TOKEN = 11
MINUS_TWO_TOKEN = 12
DCT_VAL_CAT2 = 13       # 13..16
DCT_VAL_CAT3 = 17
DCT_VAL_CAT4 = 18
DCT_VAL_CAT5 = 19
DCT_VAL_CAT6 = 20
DCT_VAL_CAT7 = 21
DCT_VAL_CAT8 = 22
DCT_RUN_CAT1A = 23      # 23..27
DCT_RUN_CAT1B = 28
DCT_RUN_CAT1C = 29
DCT_RUN_CAT2A = 30
DCT_RUN_CAT2B = 31

# Extra bits carried by each spec token (internal.c:82-95).
DCT_TOKEN_EXTRA_BITS = np.array(
    [
        0, 0, 0, 2, 3, 4, 12, 3, 6,
        0, 0, 0, 0,
        1, 1, 1, 1, 2, 3, 4, 5, 6, 10,
        1, 1, 1, 1, 1, 3, 4,
        2, 3,
    ],
    dtype=np.int32,
)

# Largest coefficient magnitude the token syntax can represent (huffman.h:25).
DCT_VAL_RANGE = 580

# Number of Huffman codebooks (codec.h:425) and tokens-per-book.
NHUFFMAN_TABLES = 80

# Huffman codebook group boundaries over zig-zag indices: group g covers
# zzi in [HUFF_LIST_MAX[g-1], HUFF_LIST_MAX[g]) (decode.c:1165).
HUFF_LIST_MAX = [1, 6, 15, 28, 64]


def ilog(v: int) -> int:
    """Number of bits needed to represent v (position of highest set bit + 1).

    Matches oc_ilog (internal.c:97).
    """
    return int(v).bit_length()
