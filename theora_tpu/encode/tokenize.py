"""Encoder-side DCT tokenization into per-(plane, zigzag) token streams.

Unlike the reference -- which tokenizes AC coefficients during analysis and
weaves DC tokens in afterwards with stack rewriting (tokenize.c:1076-1309) --
this tokenizer runs after DC prediction and walks each block's full
coefficient vector once. The emitted stream structure (per-(pli,zzi) lists,
EOB-run accumulation and flushing, final cross-stream run merging) matches
what the decoder's replay consumes (decode.c:1531-1586).
"""
from __future__ import annotations

import numpy as np

from theora_tpu.constants import (
    DCT_REPEAT_RUN3_TOKEN,
    DCT_SHORT_ZRL_TOKEN,
    DCT_TOKEN_EXTRA_BITS,
    DCT_ZRL_TOKEN,
)

# EOB run -> (token, eb) (tokenize.c:22-43).
_EOB_TOKEN = [0, 1, 2, 3, 3, 3, 3, 4, 4, 4, 4, 4, 4, 4, 4] + [5] * 16
_EOB_EB = [0, 0, 0, 0, 1, 2, 3, 0, 1, 2, 3, 4, 5, 6, 7] + list(range(16))


def make_eob_token(run: int) -> tuple[int, int]:
    if run < 32:
        return _EOB_TOKEN[run - 1], _EOB_EB[run - 1]
    return DCT_REPEAT_RUN3_TOKEN, run


def decode_eob_token(token: int, eb: int) -> int:
    """(tokenize.c:46-48)"""
    return ((0x20820C41 >> (token * 5)) & 0x1F) + eb


def value_token(v: int) -> tuple[int, int]:
    """Canonical (token, eb) for a lone coefficient value
    (the OC_DCT_VALUE_TOKEN/EB tables, tokenize.c:52-232)."""
    a = abs(v)
    neg = 1 if v < 0 else 0
    if a == 1:
        return (10 if neg else 9), 0
    if a == 2:
        return (12 if neg else 11), 0
    if a <= 6:
        return 13 + (a - 3), neg
    if a <= 8:
        return 17, (neg << 1) | (a - 7)
    if a <= 12:
        return 18, (neg << 2) | (a - 9)
    if a <= 20:
        return 19, (neg << 3) | (a - 13)
    if a <= 36:
        return 20, (neg << 4) | (a - 21)
    if a <= 68:
        return 21, (neg << 5) | (a - 37)
    if a <= 580:
        return 22, (neg << 9) | (a - 69)
    raise ValueError(f"coefficient {v} out of token range")


def combo_token(nzeros: int, v: int) -> tuple[int, int] | None:
    """(token, eb) for a zero-run + value combo, or None if not encodable
    (tokenize.c:362-373)."""
    a = abs(v)
    neg = 1 if v < 0 else 0
    if a == 1 and 1 <= nzeros <= 17:
        if nzeros <= 5:
            return 23 + nzeros - 1, neg
        if nzeros <= 9:
            return 28, (neg << 2) | (nzeros - 6)
        return 29, (neg << 3) | (nzeros - 10)
    if 2 <= a <= 3 and 1 <= nzeros <= 3:
        if nzeros == 1:
            return 30, (neg << 1) | (a - 2)
        return 31, (neg << 2) | ((a - 2) << 1) | (nzeros - 2)
    return None


def zrl_token(nzeros: int) -> tuple[int, int]:
    """Pure zero run consuming `nzeros` positions (writes a zero at the
    last)."""
    if nzeros <= 8:
        return DCT_SHORT_ZRL_TOKEN, nzeros - 1
    return DCT_ZRL_TOKEN, nzeros - 1


class TokenLog:
    """Per-(pli, zzi) token streams with EOB-run accumulation."""

    def __init__(self, huff_codes=None):
        self.tokens = [[[] for _ in range(64)] for _ in range(3)]
        self.ebs = [[[] for _ in range(64)] for _ in range(3)]
        self.eob_run = np.zeros((3, 64), dtype=np.int64)
        self.token_offs = np.zeros((3, 64), dtype=np.int64)
        # (pattern, nbits) per token for cost-aware choices; may be None.
        self.huff_codes = huff_codes

    def _log(self, pli: int, zzi: int, token: int, eb: int) -> None:
        self.tokens[pli][zzi].append(token)
        self.ebs[pli][zzi].append(eb)

    def _flush_eob(self, pli: int, zzi: int) -> None:
        run = int(self.eob_run[pli, zzi])
        if run > 0:
            t, eb = make_eob_token(run)
            self._log(pli, zzi, t, eb)
            self.eob_run[pli, zzi] = 0

    def put_token(self, pli: int, zzi: int, token: int, eb: int) -> None:
        self._flush_eob(pli, zzi)
        self._log(pli, zzi, token, eb)

    def end_block(self, pli: int, zzi: int) -> None:
        """Record that a block ended (EOB) at stream position zzi
        (tokenize.c:963-972)."""
        if zzi >= 64:
            return
        run = int(self.eob_run[pli, zzi]) + 1
        if run >= 4095:
            self._log(pli, zzi, DCT_REPEAT_RUN3_TOKEN, run)
            run = 0
        self.eob_run[pli, zzi] = run

    # ------------------------------------------------------------------
    def tokenize_block(self, pli: int, vec: np.ndarray) -> None:
        """Tokenize one block's 64 zig-zag coefficients (DC residual at
        index 0)."""
        nz = np.nonzero(vec)[0]
        zzi = 0
        for p in map(int, nz):
            v = int(vec[p])
            nzeros = p - zzi
            if nzeros == 0:
                t, eb = value_token(v)
                self.put_token(pli, zzi, t, eb)
            else:
                combo = combo_token(nzeros, v)
                if combo is not None:
                    self.put_token(pli, zzi, combo[0], combo[1])
                else:
                    zt, zeb = zrl_token(nzeros)
                    self.put_token(pli, zzi, zt, zeb)
                    # The zero run consumed positions zzi..p-1... the run
                    # token writes its zero at position zzi+nzeros-1 == p-1,
                    # so the value goes to stream p.
                    t, eb = value_token(v)
                    self.put_token(pli, p, t, eb)
            zzi = p + 1
        if zzi < 64:
            self.end_block(pli, zzi)

    # ------------------------------------------------------------------
    def finish(self) -> None:
        """Flush trailing EOB runs and merge adjacent cross-stream runs
        (tokenize.c:1310-1367)."""
        for pli in range(3):
            for zzi in range(64):
                self._flush_eob(pli, zzi)
        # Merge a leading EOB token with the previous stream's trailing one.
        for zzi in range(64):
            for pli in range(3):
                if len(self.tokens[pli][zzi]) <= int(self.token_offs[pli, zzi]):
                    continue
                first = int(self.token_offs[pli, zzi])
                tok2 = self.tokens[pli][zzi][first]
                if tok2 > 6:  # not an EOB token
                    continue
                # find previous non-empty stream in emission order
                found = None
                zzj, plj = zzi, pli
                while found is None:
                    plj -= 1
                    if plj < 0:
                        zzj -= 1
                        if zzj < 0:
                            break
                        plj = 2
                    ti = len(self.tokens[plj][zzj]) - 1
                    if ti >= int(self.token_offs[plj, zzj]):
                        found = (plj, zzj, ti)
                if found is None:
                    continue
                plj, zzj, ti = found
                tok1 = self.tokens[plj][zzj][ti]
                if tok1 > 6:
                    continue
                run = decode_eob_token(
                    tok1, self.ebs[plj][zzj][ti]
                ) + decode_eob_token(tok2, self.ebs[pli][zzi][first])
                if run >= 4096:
                    continue
                t, eb = make_eob_token(run)
                self.tokens[plj][zzj][ti] = t
                self.ebs[plj][zzj][ti] = eb
                self.token_offs[pli, zzi] += 1

    # ------------------------------------------------------------------
    def count_tokens(self, zzi_start: int, zzi_end: int):
        """Token histograms for [zzi_start, zzi_end) -> (y_counts,
        c_counts), 32 entries each (encode.c:733-758)."""
        cy = np.zeros(32, dtype=np.int64)
        cc = np.zeros(32, dtype=np.int64)
        for zzi in range(zzi_start, zzi_end):
            offs = int(self.token_offs[0, zzi])
            for t in self.tokens[0][zzi][offs:]:
                cy[t] += 1
            for pli in (1, 2):
                offs = int(self.token_offs[pli, zzi])
                for t in self.tokens[pli][zzi][offs:]:
                    cc[t] += 1
        return cy, cc
