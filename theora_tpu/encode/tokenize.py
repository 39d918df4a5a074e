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


# Trellis alternative magnitude: the top of the next-lower value-token
# category -- the largest magnitude with a strictly cheaper token
# (tokenize.c:236-348, derived from the category layout, not copied).
_ALT_QC = np.zeros(581, dtype=np.int32)
for _a in range(2, 581):
    for _lo, _hi in ((1, 1), (2, 2), (3, 3), (4, 4), (5, 5), (6, 6),
                     (7, 8), (9, 12), (13, 20), (21, 36), (37, 68),
                     (69, 580)):
        if _lo <= _a <= _hi:
            _ALT_QC[_a] = _lo - 1
            break
del _a, _lo, _hi


def _combo_run(token: int, eb: int) -> int:
    """Inverse of combo_token: the zero-run length a combo token codes."""
    if token <= 27:
        return token - 23 + 1
    if token == 28:
        return 6 + (eb & 3)
    if token == 29:
        return 10 + (eb & 7)
    if token == 30:
        return 1
    return 2 + (eb & 1)


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
    def emit_trellis(self, pli, dc, path) -> None:
        """Emit a cached trellis token path (from trellis_plan), weaving in
        the DC slot: the reference defers DC with stack rewriting
        (tokenize.c:1076-1309); knowing the predicted DC here collapses
        that into a first-token adjustment."""
        first_ac = True
        if dc != 0:
            t, eb = value_token(int(dc))
            self.put_token(pli, 0, t, eb)
            first_ac = False
        for zzi, token, eb, qc in path:
            if token < 7:
                # Terminal EOB marker.
                self.end_block(pli, 0 if first_ac else zzi)
                return
            if first_ac:
                # DC is zero: the block's first token must start at the DC
                # slot, extending any leading run by one.
                first_ac = False
                if token in (DCT_SHORT_ZRL_TOKEN, DCT_ZRL_TOKEN):
                    token, eb = zrl_token(eb + 2)
                    self.put_token(pli, 0, token, eb)
                elif token >= 23:
                    # Run+value combo: re-derive with one more zero (the
                    # DP reserved headroom for this).
                    nzeros = _combo_run(token, eb)
                    token, eb = combo_token(nzeros + 1, qc)
                    self.put_token(pli, 0, token, eb)
                else:
                    # Lone value right after a zero DC.
                    combo = combo_token(1, qc)
                    if combo is not None:
                        self.put_token(pli, 0, combo[0], combo[1])
                    else:
                        zt, zeb = zrl_token(1)
                        self.put_token(pli, 0, zt, zeb)
                        self.put_token(pli, zzi, token, eb)
            else:
                self.put_token(pli, zzi, token, eb)

    def tokenize_block_trellis(
        self, pli, dc, dct, qdct, dequant, lam, acmin, nb,
    ) -> int:
        """trellis_plan + emit_trellis in one step (testing convenience)."""
        path, ac_bits, _vals = trellis_plan(
            dct, qdct, dequant, lam, acmin, nb,
            int(self.eob_run[pli, 1]),
        )
        self.emit_trellis(pli, dc, path)
        return ac_bits

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


def trellis_plan(dct, qdct, dequant, lam, acmin, nb, eob=0):
    """Viterbi plan for one block's AC coefficients: jointly choose the
    quantized values and token structure minimizing d2 + lam*bits with
    exact Huffman bit costs. A re-derivation of the reference's trellis
    (tokenize.c:457-744) decoupled from stream state so plans can drive
    skip decisions before emission.

    dct/qdct/dequant: [64] zig-zag (dct unquantized int64, qdct
    round-to-nearest); nb(zzi, token) -> bit cost (code length + extra
    bits); eob: pending-EOB-run hint for the terminal cost. Returns
    (path, ac_bits, vals): path = [(stream_zzi, token, eb, qc)] with a
    token<7 terminal marking EOB; ac_bits excludes the terminal EOB cost
    (it is very likely shared across blocks); vals = [(pos, qc)] nonzero
    AC values on the chosen path.
    """
    nz = np.nonzero(qdct[1:])[0]
    zzi_max = min(int(nz[-1]) + 2 if len(nz) else 1, 63)
    # DP state: per position, node 0 = coded zero (run/EOB), node 1 =
    # coded nonzero. next packs (position << 1) | node.
    nxt = [[0, 0] for _ in range(64)]
    tokv = [[0, 0] for _ in range(64)]
    ebv = [[0, 0] for _ in range(64)]
    cost = [[0, 0] for _ in range(64)]
    bitsv = [[0, 0] for _ in range(64)]
    qcv = [[0, 0] for _ in range(64)]
    d2_accum = [0] * 64
    zflags = 1          # bit z: node (z, 0) exists (bit 0: sentinel)
    nzflags = 0         # bit z: node (z, 1) exists
    bflags = 0          # bit z: nonzero node is the cheaper of the two
    zzj = 64
    zzi = zzi_max
    while zzi > 0:
        qc = int(qdct[zzi])
        aqc = -qc if qc < 0 else qc
        c = int(dct[zzi])
        if aqc <= 1:
            if aqc == 0:
                # A run of already-zero coefficients never re-quantizes;
                # consume it whole (linear, not quadratic, in zeros).
                while zzi > 1 and qdct[zzi - 1] == 0:
                    zzi -= 1
                d2 = 0
            else:
                d2 = c * c
                c = -c if c < 0 else c
            nzeros = zzj - zzi
            zzj &= 63
            sum_d2 = d2 + d2_accum[zzj]
            d2_accum[zzi] = sum_d2
            # Keep room to extend a run starting at the first AC slot
            # over a zero DC coefficient.
            dc_reserve = (zzi + 62) >> 6
            best_cost = 1 << 62
            best_bits = best_next = best_token = best_eb = best_qc = 0
            have_best = False
            while True:
                if (nzflags >> zzj) & 1:
                    nx1 = nxt[zzj][1]
                    tk = nx1 & 1
                    zzk = nx1 >> 1
                    # Pure zero run ending right before nonzero zzj.
                    token = DCT_SHORT_ZRL_TOKEN + ((nzeros + 55) >> 6)
                    b = nb(zzi, token)
                    cst = sum_d2 - d2_accum[zzj] + lam * b + cost[zzj][1]
                    if cst <= best_cost:
                        best_next = (zzj << 1) + 1
                        best_token = token
                        best_eb = nzeros - 1
                        best_cost = cst
                        best_bits = b + bitsv[zzj][1]
                        best_qc = 0
                        have_best = True
                    if nzeros < 17 + dc_reserve:
                        val = int(qdct[zzj])
                        va = -val if val < 0 else val
                        if va <= 2:
                            # Run + value +-1 combo.
                            sval = -1 if val < 0 else 1
                            token, ebc = combo_token(nzeros, sval)
                            e = int(dct[zzj]) - sval * int(dequant[zzj])
                            b = nb(zzi, token)
                            cst = (
                                e * e + sum_d2 - d2_accum[zzj]
                                + lam * b + cost[zzk][tk]
                            )
                            if cst <= best_cost:
                                best_next = nx1
                                best_token = token
                                best_eb = ebc
                                best_cost = cst
                                best_bits = b + bitsv[zzk][tk]
                                best_qc = sval
                                have_best = True
                        if nzeros < 3 + dc_reserve and 2 <= va <= 4:
                            # Run + value +-2/3 combo.
                            v2 = 2 + (1 if va > 2 else 0)
                            sval = -v2 if val < 0 else v2
                            token, ebc = combo_token(nzeros, sval)
                            e = int(dct[zzj]) - sval * int(dequant[zzj])
                            b = nb(zzi, token)
                            cst = (
                                e * e + sum_d2 - d2_accum[zzj]
                                + lam * b + cost[zzk][tk]
                            )
                            if cst <= best_cost:
                                best_next = nx1
                                best_token = token
                                best_eb = ebc
                                best_cost = cst
                                best_bits = b + bitsv[zzk][tk]
                                best_qc = sval
                                have_best = True
                    if not ((zflags >> zzj) & 1):
                        break
                zzj = ((nxt[zzj][0] >> 1) - (1 if qcv[zzj][0] else 0)) & 63
                if zzj == 0:
                    # Run reaches the end of the block: EOB. Cost is the
                    # marginal cost of extending the pending run.
                    if eob < 4095:
                        t1, _ = make_eob_token(eob + 1)
                        b = nb(zzi, t1)
                        if eob > 0:
                            t0, _ = make_eob_token(eob)
                            b -= nb(zzi, t0)
                    else:
                        b = nb(zzi, 0)
                    cst = sum_d2 + lam * b
                    # A pure zero run to position 63 must be an EOB.
                    if cst <= best_cost or (
                        have_best
                        and best_token <= DCT_ZRL_TOKEN
                        and zzi + best_eb == 63
                    ):
                        best_next = 0
                        best_token = 0     # EOB marker
                        best_eb = 0
                        best_cost = cst
                        best_bits = b
                        best_qc = 0
                    break
                nzeros = zzj - zzi
            nxt[zzi][0] = best_next
            tokv[zzi][0] = best_token
            ebv[zzi][0] = best_eb
            cost[zzi][0] = best_cost
            bitsv[zzi][0] = best_bits
            qcv[zzi][0] = best_qc
            zflags |= 1 << zzi
            if aqc:
                if zzi < acmin:
                    lam = 0
                dq = int(dequant[zzi])
                e = dq - c
                token = 9 if qc > 0 else 10
                b = nb(zzi, token)
                zzk = (zzi + 1) & 63
                tk = (bflags >> zzk) & 1
                nxt[zzi][1] = (zzk << 1) + tk
                tokv[zzi][1] = token
                ebv[zzi][1] = 0
                cost[zzi][1] = e * e + lam * b + cost[zzk][tk]
                bitsv[zzi][1] = b + bitsv[zzk][tk]
                qcv[zzi][1] = 1 if qc > 0 else -1
                nzflags |= 1 << zzi
                if cost[zzi][1] < cost[zzi][0]:
                    bflags |= 1 << zzi
        else:
            if zzi < acmin:
                lam = 0
            dq = int(dequant[zzi])
            d2_accum[zzi] = 0
            if aqc > 580:
                qc = 580 if qc > 0 else -580
                aqc = 580
            e = qc * dq - c
            best_token, best_ebt = value_token(qc)
            best_bits = nb(zzi, best_token)
            best_cost = e * e + lam * best_bits
            best_qc = qc
            # One step down the token-category ladder.
            alt = int(_ALT_QC[aqc])
            salt = -alt if qc < 0 else alt
            e = salt * dq - c
            token, ebt = value_token(salt)
            b = nb(zzi, token)
            cst = e * e + lam * b
            if cst < best_cost:
                best_token, best_ebt = token, ebt
                best_bits = b
                best_cost = cst
                best_qc = salt
            zzk = (zzi + 1) & 63
            tk = (bflags >> zzk) & 1
            nxt[zzi][1] = (zzk << 1) + tk
            tokv[zzi][1] = best_token
            ebv[zzi][1] = best_ebt
            cost[zzi][1] = best_cost + cost[zzk][tk]
            bitsv[zzi][1] = best_bits + bitsv[zzk][tk]
            qcv[zzi][1] = best_qc
            nzflags |= 1 << zzi
            bflags |= 1 << zzi
        zzj = zzi
        zzi -= 1

    # ---- Walk the winning path into a forward token list ----------------
    path = []
    vals = []
    ti = (bflags >> 1) & 1
    ac_bits = bitsv[1][ti]
    zzi = 1
    while zzi:
        token = tokv[zzi][ti]
        if token < 7:
            ac_bits -= bitsv[zzi][ti]
            path.append((zzi, 0, 0, 0))
            break
        nx = nxt[zzi][ti]
        qc = qcv[zzi][ti]
        path.append((zzi, token, ebv[zzi][ti], qc))
        if qc:
            # The coded value lands just before the next token's start.
            vals.append((((nx >> 1) - 1) & 63, qc))
        zzi = nx >> 1
        ti = nx & 1
    return path, ac_bits, vals
