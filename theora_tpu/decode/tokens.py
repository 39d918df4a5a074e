"""Residual token stream unpack and per-fragment coefficient replay.

Phase 1 (bitstream order) decodes all DCT tokens for a frame into dense
per-(plane, zigzag) arrays, materializing DC values for prediction
(decode.c:985-1201). Phase 2 replays the streams per coded fragment to
produce dequantized coefficient blocks (decode.c:1531-1586). EOB runs span
blocks, planes, and coefficient groups; the carried run state is explicit.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from theora_tpu.bitio import BitReader
from theora_tpu.constants import HUFF_LIST_MAX
from theora_tpu.huffman import (
    Codebook,
    EOB_FINISH,
    expand_token,
    token_extra_bits,
)


@dataclasses.dataclass
class TokenStreams:
    """Decoded token streams for one frame.

    tokens[pli][zzi] / ebs[pli][zzi]: python lists of ints.
    eob_start[pli][zzi]: EOB run outstanding when the stream starts.
    dc: [nfrags] int32 DC coefficient per coded fragment (pre-prediction).
    """

    tokens: list
    ebs: list
    eob_start: np.ndarray
    dc: np.ndarray


def residual_tokens_unpack(
    br: BitReader,
    codebooks: list[Codebook],
    ncoded_per_plane: list[int],
    coded_fragis_per_plane: list[np.ndarray],
    nfrags: int,
) -> TokenStreams:
    """Decode all DCT tokens of a frame (decode.c:1164-1201)."""
    tokens = [[[] for _ in range(64)] for _ in range(3)]
    ebs = [[[] for _ in range(64)] for _ in range(3)]
    eob_start = np.zeros((3, 64), dtype=np.int64)
    dc = np.zeros(nfrags, dtype=np.int32)
    ntoks_left = np.zeros((3, 64), dtype=np.int64)
    for pli in range(3):
        ntoks_left[pli, :] = ncoded_per_plane[pli]

    # --- DC tokens (zzi == 0), with DC value materialization -------------
    huff_idxs = [br.read(4), br.read(4)]
    eobs = 0
    for pli in range(3):
        book = codebooks[huff_idxs[(pli + 1) >> 1]]
        run_counts = np.zeros(64, dtype=np.int64)
        eob_start[pli, 0] = eobs
        fragis = coded_fragis_per_plane[pli]
        n = len(fragis)
        fragii = 0
        # Continue any previous EOB run.
        eobi = min(eobs, n)
        eob_count = eobi
        eobs -= eobi
        fragii += eobi  # dc already zero
        while fragii < n:
            token = book.decode(br)
            neb = token_extra_bits(token)
            eb = br.read(neb) if neb else 0
            tokens[pli][0].append(token)
            ebs[pli][0].append(eb)
            t_eobs, rlen, coeff = expand_token(token, eb)
            if t_eobs:
                eobi = min(t_eobs, n - fragii)
                eob_count += eobi
                eobs = t_eobs - eobi
                fragii += eobi
            else:
                run_counts[rlen] += 1
                dc[fragis[fragii]] = 0 if rlen else coeff
                fragii += 1
        run_counts[63] += eob_count
        # suffix-sum moments, then subtract from later coefficients
        rc = np.cumsum(run_counts[::-1])[::-1]
        ntoks_left[pli, :] -= rc

    # --- AC tokens (zzi 1..63), grouped by Huffman group ------------------
    huff_idxs = [br.read(4), br.read(4)]
    zzi = 1
    for hgi in range(1, 5):
        huff_idxs = [huff_idxs[0] + 16, huff_idxs[1] + 16]
        while zzi < HUFF_LIST_MAX[hgi]:
            for pli in range(3):
                book = codebooks[huff_idxs[(pli + 1) >> 1]]
                eob_start[pli, zzi] = min(eobs, EOB_FINISH)
                run_counts = np.zeros(64, dtype=np.int64)
                eob_count = 0
                ntl = int(ntoks_left[pli, zzi])
                ntoks = 0
                while ntoks + eobs < ntl:
                    ntoks += eobs
                    eob_count += eobs
                    token = book.decode(br)
                    neb = token_extra_bits(token)
                    eb = br.read(neb) if neb else 0
                    tokens[pli][zzi].append(token)
                    ebs[pli][zzi].append(eb)
                    t_eobs, rlen, _coeff = expand_token(token, eb)
                    eobs = t_eobs
                    if eobs == 0:
                        run_counts[rlen] += 1
                        ntoks += 1
                eob_count += ntl - ntoks
                eobs -= ntl - ntoks
                run_counts[63] += eob_count
                rc = np.cumsum(run_counts[::-1])[::-1]
                ntoks_left[pli, zzi : 64] -= rc[: 64 - zzi]
            zzi += 1
    return TokenStreams(tokens=tokens, ebs=ebs, eob_start=eob_start, dc=dc)


def replay_coefficients(
    streams: TokenStreams,
    coded_fragis_per_plane: list[np.ndarray],
):
    """Replay token streams per coded fragment (decode.c:1531-1586).

    Returns (qcoeffs, last_zzi, order) where
      qcoeffs: [ncoded_total, 64] int32 quantized coefficients at their
        final zig-zag positions (dequantization happens downstream with the
        per-position factors),
      last_zzi: [ncoded_total] int32,
      order: [ncoded_total] int32 fragment indices (coded order).
    """
    total = sum(len(f) for f in coded_fragis_per_plane)
    qcoeffs = np.zeros((total, 64), dtype=np.int32)
    last_zzis = np.zeros(total, dtype=np.int32)
    order = np.concatenate(
        [f for f in coded_fragis_per_plane]
    ).astype(np.int32) if total else np.zeros(0, dtype=np.int32)
    out_i = 0
    for pli in range(3):
        toks = streams.tokens[pli]
        ebl = streams.ebs[pli]
        ti = [0] * 64
        eob_runs = streams.eob_start[pli].copy()
        for _fragi in coded_fragis_per_plane[pli]:
            row = qcoeffs[out_i]
            zzi = 0
            last_zzi = 0
            while zzi < 64:
                last_zzi = zzi
                if eob_runs[zzi]:
                    eob_runs[zzi] -= 1
                    break
                token = toks[zzi][ti[zzi]]
                eb = ebl[zzi][ti[zzi]]
                ti[zzi] += 1
                t_eobs, rlen, coeff = expand_token(token, eb)
                eob_runs[zzi] = t_eobs
                zzi += rlen
                if zzi < 64:
                    row[zzi] = coeff
                # else: overflow dump (bogus streams), dropped
                zzi += 1 if t_eobs == 0 else 0
            last_zzis[out_i] = last_zzi
            out_i += 1
    return qcoeffs, last_zzis, order
