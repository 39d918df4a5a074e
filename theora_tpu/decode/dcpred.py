"""DC prediction reversal (decoder side), bit-exact with the 16-case
neighbor-reference switch of oc_dec_dc_unpredict_mcu_plane_c
(decode.c:1392-1500).

Sequential row scan per plane; divisions truncate toward zero like C. The
dc values live in a signed 16-bit domain (the reference stores them in an
int:16 bitfield).
"""
from __future__ import annotations

import numpy as np


def _cdiv(a: int, b: int) -> int:
    """C-style integer division (truncate toward zero)."""
    q = abs(a) // b
    return -q if a < 0 else q


def _wrap16(v: int) -> int:
    return (v + 0x8000) % 0x10000 - 0x8000


def _predict(coded, refi, dc, pred_last, fy, fx, nh):
    """Shared DC predictor for one fragment (the 16-case switch)."""
    r = int(refi[fy, fx])
    l_ok = fx > 0 and coded[fy, fx - 1]
    l_ref = int(refi[fy, fx - 1]) if l_ok else -1
    if fy > 0:
        u_ref = int(refi[fy - 1, fx]) if coded[fy - 1, fx] else -1
        ul_ref = (
            int(refi[fy - 1, fx - 1]) if fx > 0 and coded[fy - 1, fx - 1] else -1
        )
        ur_ref = (
            int(refi[fy - 1, fx + 1])
            if fx + 1 < nh and coded[fy - 1, fx + 1]
            else -1
        )
    else:
        u_ref = ul_ref = ur_ref = -1
    if fy == 0:
        return pred_last[r], r
    case = (
        (1 if l_ref == r else 0)
        | (2 if ul_ref == r else 0)
        | (4 if u_ref == r else 0)
        | (8 if ur_ref == r else 0)
    )
    if case in (1, 3):
        pred = int(dc[fy, fx - 1])
    elif case == 2:
        pred = int(dc[fy - 1, fx - 1])
    elif case in (4, 6, 12):
        pred = int(dc[fy - 1, fx])
    elif case == 5:
        pred = _cdiv(int(dc[fy, fx - 1]) + int(dc[fy - 1, fx]), 2)
    elif case == 8:
        pred = int(dc[fy - 1, fx + 1])
    elif case in (9, 11, 13):
        pred = _cdiv(75 * int(dc[fy, fx - 1]) + 53 * int(dc[fy - 1, fx + 1]), 128)
    elif case == 10:
        pred = _cdiv(int(dc[fy - 1, fx - 1]) + int(dc[fy - 1, fx + 1]), 2)
    elif case == 14:
        pred = _cdiv(
            3 * (int(dc[fy - 1, fx - 1]) + int(dc[fy - 1, fx + 1]))
            + 10 * int(dc[fy - 1, fx]),
            16,
        )
    elif case in (7, 15):
        p0 = int(dc[fy, fx - 1])
        p1 = int(dc[fy - 1, fx - 1])
        p2 = int(dc[fy - 1, fx])
        pred = _cdiv(29 * (p0 + p2) - 26 * p1, 32)
        if abs(pred - p2) > 128:
            pred = p2
        elif abs(pred - p0) > 128:
            pred = p0
        elif abs(pred - p1) > 128:
            pred = p1
    else:
        pred = pred_last[r]
    return pred, r


def dc_predict_plane_enc(coded, refi, dc, pred_last):
    """Encoder-side DC prediction: residual = dc - pred
    (tokenize.c:977-1074). Returns [nv, nh] int32 residuals; `dc` holds the
    quantized DC values and is left unmodified."""
    nv, nh = coded.shape
    out = np.zeros((nv, nh), dtype=np.int32)
    for fy in range(nv):
        for fx in range(nh):
            if not coded[fy, fx]:
                continue
            pred, r = _predict(coded, refi, dc, pred_last, fy, fx, nh)
            out[fy, fx] = _wrap16(int(dc[fy, fx]) - pred)
            pred_last[r] = int(dc[fy, fx])
    return out


def dc_unpredict_plane(
    coded: np.ndarray,   # [nv, nh] bool
    refi: np.ndarray,    # [nv, nh] int (FRAME_GOLD/PREV/SELF; FRAME_NONE if uncoded)
    dc: np.ndarray,      # [nv, nh] int32, modified in place
    pred_last: list,     # [3] running predictor per reference frame, updated
) -> None:
    nv, nh = coded.shape
    for fy in range(nv):
        if fy == 0:
            for fx in range(nh):
                if coded[0, fx]:
                    r = refi[0, fx]
                    v = _wrap16(dc[0, fx] + pred_last[r])
                    dc[0, fx] = v
                    pred_last[r] = v
        else:
            l_ref = -1
            ul_ref = -1
            u_ref = int(refi[fy - 1, 0]) if coded[fy - 1, 0] else -1
            for fx in range(nh):
                if fx + 1 >= nh:
                    ur_ref = -1
                else:
                    ur_ref = (
                        int(refi[fy - 1, fx + 1]) if coded[fy - 1, fx + 1] else -1
                    )
                if coded[fy, fx]:
                    r = int(refi[fy, fx])
                    case = (
                        (1 if l_ref == r else 0)
                        | (2 if ul_ref == r else 0)
                        | (4 if u_ref == r else 0)
                        | (8 if ur_ref == r else 0)
                    )
                    if case in (1, 3):
                        pred = int(dc[fy, fx - 1])
                    elif case == 2:
                        pred = int(dc[fy - 1, fx - 1])
                    elif case in (4, 6, 12):
                        pred = int(dc[fy - 1, fx])
                    elif case == 5:
                        pred = _cdiv(int(dc[fy, fx - 1]) + int(dc[fy - 1, fx]), 2)
                    elif case == 8:
                        pred = int(dc[fy - 1, fx + 1])
                    elif case in (9, 11, 13):
                        pred = _cdiv(
                            75 * int(dc[fy, fx - 1]) + 53 * int(dc[fy - 1, fx + 1]),
                            128,
                        )
                    elif case == 10:
                        pred = _cdiv(
                            int(dc[fy - 1, fx - 1]) + int(dc[fy - 1, fx + 1]), 2
                        )
                    elif case == 14:
                        pred = _cdiv(
                            3 * (int(dc[fy - 1, fx - 1]) + int(dc[fy - 1, fx + 1]))
                            + 10 * int(dc[fy - 1, fx]),
                            16,
                        )
                    elif case in (7, 15):
                        p0 = int(dc[fy, fx - 1])
                        p1 = int(dc[fy - 1, fx - 1])
                        p2 = int(dc[fy - 1, fx])
                        pred = _cdiv(29 * (p0 + p2) - 26 * p1, 32)
                        if abs(pred - p2) > 128:
                            pred = p2
                        elif abs(pred - p0) > 128:
                            pred = p0
                        elif abs(pred - p1) > 128:
                            pred = p1
                    else:
                        pred = pred_last[r]
                    v = _wrap16(int(dc[fy, fx]) + pred)
                    dc[fy, fx] = v
                    pred_last[r] = v
                    l_ref = r
                else:
                    l_ref = -1
                ul_ref = u_ref
                u_ref = ur_ref
