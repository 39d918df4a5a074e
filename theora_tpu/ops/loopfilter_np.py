"""In-loop deblocking filter, bit-exact with the VP3 edge ordering
(state.c:1002-1105). Host/numpy tier.

The filter response is f' = bv[(f+4)>>3] with f = p0 - p3 + 3*(p2-p1); the
two middle pixels across each edge move by +f'/-f' with clamping. The edge
application ORDER matters (filters read pixels earlier filters wrote); this
implementation walks fragments in raster order exactly like the reference:
for each coded fragment: left edge, top edge, right edge (if right neighbor
uncoded), bottom edge (if below neighbor uncoded).
"""
from __future__ import annotations

import numpy as np


def build_bounding_values(flimit: int) -> np.ndarray:
    """Bounding-value table, indexed by ((f+4)>>3) + 127 (state.c:1036-1045)."""
    bv = np.zeros(256, dtype=np.int32)
    for i in range(flimit):
        if 127 - i - flimit >= 0:
            bv[127 - i - flimit] = i - flimit
        bv[127 - i] = -i
        bv[127 + i] = i
        if 127 + i + flimit < 256:
            bv[127 + i + flimit] = flimit - i
    return bv


def _filter_h(plane: np.ndarray, y: int, x: int, bv: np.ndarray) -> None:
    """Filter the vertical edge at column x, rows y..y+7 (state.c:1002-1016).

    plane is int-typed [H, W] (padded); x is the column of the first pixel
    right of the edge.
    """
    p = plane[y : y + 8, x - 2 : x + 2].astype(np.int32)
    f = p[:, 0] - p[:, 3] + 3 * (p[:, 2] - p[:, 1])
    r = bv[((f + 4) >> 3) + 127]
    plane[y : y + 8, x - 1] = np.clip(p[:, 1] + r, 0, 255)
    plane[y : y + 8, x] = np.clip(p[:, 2] - r, 0, 255)


def _filter_v(plane: np.ndarray, y: int, x: int, bv: np.ndarray) -> None:
    """Filter the horizontal edge at row y, columns x..x+7
    (state.c:1018-1031)."""
    p = plane[y - 2 : y + 2, x : x + 8].astype(np.int32)
    f = p[0] - p[3] + 3 * (p[2] - p[1])
    r = bv[((f + 4) >> 3) + 127]
    plane[y - 1, x : x + 8] = np.clip(p[1] + r, 0, 255)
    plane[y, x : x + 8] = np.clip(p[2] - r, 0, 255)


def loop_filter_plane(
    plane: np.ndarray,
    coded: np.ndarray,
    bv: np.ndarray,
    frag_y0: int = 0,
    frag_y_end: int | None = None,
) -> None:
    """Apply the loop filter to one plane in place, VP3 order
    (state.c:1055-1105).

    plane: [H+2*pad, W+2*pad] uint8 array; the image origin is at
      (pad, pad) -- pad must be >= 2.
    coded: [nvfrags, nhfrags] bool.
    """
    nv, nh = coded.shape
    if frag_y_end is None:
        frag_y_end = nv
    pad = (plane.shape[1] - nh * 8) // 2
    for fy in range(frag_y0, frag_y_end):
        py = pad + fy * 8
        for fx in range(nh):
            if not coded[fy, fx]:
                continue
            px = pad + fx * 8
            if fx > 0:
                _filter_h(plane, py, px, bv)
            if fy > 0:
                _filter_v(plane, py, px, bv)
            if fx + 1 < nh and not coded[fy, fx + 1]:
                _filter_h(plane, py, px + 8, bv)
            if fy + 1 < nv and not coded[fy + 1, fx]:
                _filter_v(plane, py + 8, px, bv)
