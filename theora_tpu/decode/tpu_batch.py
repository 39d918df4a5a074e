"""GOP-batch TPU decode: host entropy for all frames up front, then ONE
jitted lax.scan per plane runs the entire pixel pipeline (dequant + iDCT
+ MC + reconstruction + loop filter + borders) for every frame on
device, carrying the reference planes in the scan state.

This amortizes the host<->device transfer and dispatch that bound the
per-frame TpuDecoder (~0.2 ms/frame compute vs ~10 ms tunnel): a batch
moves one coefficient tensor up and one YUV tensor down. Bit-exact with
the scalar decoder (same integer kernels; dense uncoded-fragment
formulation of decode/tpu_decoder.py).
"""
from __future__ import annotations

import functools

import numpy as np

from theora_tpu.constants import FRAME_GOLD, FRAME_PREV, FRAME_SELF
from theora_tpu.decode.decoder import Decoder, _MVMAP, _MVMAP2
from theora_tpu.info import INTRA_FRAME


@functools.partial(
    __import__("jax").jit,
    static_argnames=("nv", "nh", "pad_y", "pad_x"),
)
def _scan_decode_plane(
    init_prev, init_gold,
    qz, deq_tab, qii, inter, dc, dc_only, refsel,
    o1y, o1x, o2y, o2x, use2, coded, bv, do_filter, is_intra,
    nv, nh, pad_y, pad_x,
):
    """Scan over F frames for one plane.

    Per-frame inputs are stacked on axis 0; refsel==0 selects intra
    (128), 1 PREV, 2 GOLD. is_intra[f] rotates GOLD; do_filter[f] gates
    the loop filter (multiplied into bv).
    """
    import jax
    import jax.numpy as jnp

    from theora_tpu.ops import transforms_jax as tj
    from theora_tpu.ops.loopfilter_jax import loop_filter_plane_jax
    from theora_tpu.pipeline import fill_borders

    h, w = nv * 8, nh * 8

    def step(carry, xs):
        prev_plane, gold_plane = carry
        (qzf, deqt, qiif, intf, dcf, dof, rsf, y1, x1, y2, x2, u2, codedf,
         bvf, isintra) = xs
        deqf = deqt[qiif.astype(jnp.int32), intf.astype(jnp.int32)].astype(
            jnp.int32
        )
        dcqf = deqt[0, intf.astype(jnp.int32), 0].astype(jnp.int32)
        residual = tj.dequantize_idct(
            qzf.astype(jnp.int32), deqf, dcf.astype(jnp.int32), dcqf, dof
        )
        by = pad_y + 8 * (jnp.arange(nv * nh) // nh)
        bx = pad_x + 8 * (jnp.arange(nv * nh) % nh)
        ay = by[:, None, None] + jnp.arange(8)[None, :, None]
        ax = bx[:, None, None] + jnp.arange(8)[None, None, :]
        p1 = prev_plane[ay + y1[:, None, None], ax + x1[:, None, None]]
        p2 = prev_plane[ay + y2[:, None, None], ax + x2[:, None, None]]
        g1 = gold_plane[ay + y1[:, None, None], ax + x1[:, None, None]]
        g2 = gold_plane[ay + y2[:, None, None], ax + x2[:, None, None]]
        pp = jnp.where(
            u2[:, None, None],
            (p1.astype(jnp.int32) + p2) >> 1,
            p1.astype(jnp.int32),
        )
        gg = jnp.where(
            u2[:, None, None],
            (g1.astype(jnp.int32) + g2) >> 1,
            g1.astype(jnp.int32),
        )
        pred = jnp.where(
            (rsf == 0)[:, None, None],
            128,
            jnp.where((rsf == 1)[:, None, None], pp, gg),
        )
        blocks = jnp.clip(residual + pred, 0, 255).astype(jnp.uint8)
        plane = jnp.zeros_like(prev_plane).at[ay, ax].set(blocks)
        plane = loop_filter_plane_jax(
            plane, codedf, bvf, nv, nh, pad_y, pad_x
        )
        plane = fill_borders(plane, h, w, pad_y, pad_x)
        gold_new = jnp.where(isintra, plane, gold_plane)
        return (plane, gold_new), plane

    bvs = bv * do_filter[:, None].astype(jnp.int32)
    (_, _), planes = jax.lax.scan(
        step,
        (init_prev, init_gold),
        (qz, deq_tab, qii, inter, dc, dc_only, refsel,
         o1y, o1x, o2y, o2x, use2, coded, bvs, is_intra),
    )
    return planes


class TpuBatchDecoder(Decoder):
    """Decode a batch of packets with one device dispatch per plane."""

    def decode_batch(self, packets: list[bytes]) -> list[list[np.ndarray]]:
        """Returns display-orientation [y, u, v] planes per packet.
        The batch must start at a decodable point (keyframe or existing
        reference state); dup packets repeat the previous output."""
        import jax.numpy as jnp

        from theora_tpu.ops.loopfilter_np import build_bounding_values

        g = self.geometry
        nfrags = g.nfrags
        F = len(packets)
        per_frame = []
        for data in packets:
            if len(data) == 0:
                self.frame_type = 1
                self._update_granpos()
                per_frame.append(None)
                continue
            side = self._parse_sideinfo_native(data)
            coded = side["coded"]
            per_plane_fragis = []
            for pli in range(3):
                sel = g.scan_pli == pli
                fr = g.scan_fragis[sel]
                per_plane_fragis.append(fr[coded[fr]])
            order = np.concatenate(per_plane_fragis).astype(np.int32)
            qzc, lz, dcc, _ = self._native.decode_frame_tokens(
                data, side["bitpos"], [len(f) for f in per_plane_fragis]
            )
            self._update_granpos()
            qz = np.zeros((nfrags, 64), dtype=np.int32)
            qz[order] = qzc
            last_zzi = np.full(nfrags, 64, dtype=np.int32)
            last_zzi[order] = lz
            dc_full = np.zeros(nfrags, dtype=np.int32)
            dc_full[order] = dcc
            from theora_tpu.native import dc_predict_native

            for pli in range(3):
                pl = g.planes[pli]
                sl = slice(pl.froffset, pl.froffset + pl.nfrags)
                shape = (pl.nvfrags, pl.nhfrags)
                dc_pl = np.ascontiguousarray(dc_full[sl].reshape(shape))
                dc_predict_native(
                    0, coded[sl].reshape(shape),
                    side["refi"][sl].reshape(shape), dc_pl, [0, 0, 0],
                )
                dc_full[sl] = dc_pl.reshape(-1)
            per_frame.append(
                dict(side=side, coded=coded, qz=qz, last_zzi=last_zzi,
                     dc=dc_full, ftype=self.frame_type, qis=list(self.qis))
            )
        live = [f for f in per_frame if f is not None]
        if not live:
            return [self.ycbcr_out() for _ in packets]

        # Stack per-plane inputs over live frames and scan on device.
        out_planes = {}
        for pli in range(3):
            pl = g.planes[pli]
            sl = slice(pl.froffset, pl.froffset + pl.nfrags)
            vpad, hpad = g.plane_padding(pli)
            qpx = 1 if (pli != 0 and not (self.info.pixel_fmt & 1)) else 0
            qpy = 1 if (pli != 0 and not (self.info.pixel_fmt & 2)) else 0
            stacks = {k: [] for k in
                      "qz deqt qii inter dc donly rs y1 x1 y2 x2 u2 coded "
                      "bvf ik".split()}
            for fr in live:
                side = fr["side"]
                frame_dequant = np.stack(
                    [np.stack([self.dequant[qi, pli] for qi in fr["qis"]])]
                )[0]
                refi = side["refi"][sl]
                mode_inter = (refi != FRAME_SELF).astype(np.int8)
                rs = np.where(
                    refi == FRAME_SELF, 0,
                    np.where(refi == FRAME_GOLD, 2, 1),
                ).astype(np.int8)
                # Pad the qii axis to 3 so shapes are static across frames.
                deqt = np.zeros((3, 2, 64), np.int16)
                deqt[: len(fr["qis"])] = frame_dequant.astype(np.int16)
                qii = side["qii"][sl].astype(np.int8)
                dx = side["mv"][sl, 0]
                dy = side["mv"][sl, 1]
                mx = _MVMAP[qpx][dx + 31]
                mx2 = _MVMAP2[qpx][dx + 31]
                my = _MVMAP[qpy][dy + 31]
                my2 = _MVMAP2[qpy][dy + 31]
                u2 = ((mx2 != 0) | (my2 != 0)) & (rs != 0)
                coded = fr["coded"][sl]
                donly = (fr["last_zzi"][sl] < 2) | ~coded
                flimit = self.setup.qinfo["loop_filter_limits"][fr["qis"][0]]
                bvf = (
                    build_bounding_values(flimit).astype(np.int32)
                    if flimit
                    else np.zeros(256, np.int32)
                )
                stacks["qz"].append(fr["qz"][sl].astype(np.int16))
                stacks["deqt"].append(deqt)
                stacks["qii"].append(qii)
                stacks["inter"].append(mode_inter)
                stacks["dc"].append(fr["dc"][sl].astype(np.int16))
                stacks["donly"].append(donly)
                stacks["rs"].append(rs.astype(np.int8))
                stacks["y1"].append(my.astype(np.int8))
                stacks["x1"].append(mx.astype(np.int8))
                stacks["y2"].append((my + my2).astype(np.int8))
                stacks["x2"].append((mx + mx2).astype(np.int8))
                stacks["u2"].append(u2)
                stacks["coded"].append(
                    coded.reshape(pl.nvfrags, pl.nhfrags)
                )
                stacks["bvf"].append(bvf)
                stacks["ik"].append(fr["ftype"] == INTRA_FRAME)
            arrs = {k: jnp.asarray(np.stack(v)) for k, v in stacks.items()}
            prev_i = self.ref_idx[FRAME_PREV]
            gold_i = self.ref_idx[FRAME_GOLD]
            if prev_i < 0 or gold_i < 0:
                init = jnp.full(
                    (pl.nvfrags * 8 + 2 * vpad, pl.nhfrags * 8 + 2 * hpad),
                    0x80, jnp.uint8,
                )
                init_prev = init_gold = init
            else:
                init_prev = jnp.asarray(self.buffers[prev_i].planes[pli])
                init_gold = jnp.asarray(self.buffers[gold_i].planes[pli])
            do_filter = jnp.asarray(
                np.array([1 if b.any() else 0 for b in stacks["bvf"]],
                         np.int32)
            )
            planes = _scan_decode_plane(
                init_prev, init_gold,
                arrs["qz"], arrs["deqt"], arrs["qii"], arrs["inter"],
                arrs["dc"], arrs["donly"], arrs["rs"], arrs["y1"],
                arrs["x1"], arrs["y2"], arrs["x2"], arrs["u2"],
                arrs["coded"], arrs["bvf"], do_filter,
                jnp.asarray(arrs["ik"]),
                pl.nvfrags, pl.nhfrags, vpad, hpad,
            )
            out_planes[pli] = np.asarray(planes)

        # Update host-side reference state to the batch's final frames.
        last_intra = None
        for i, fr in enumerate(live):
            if fr["ftype"] == INTRA_FRAME:
                last_intra = i
        refi = 0
        while refi in (self.ref_idx[FRAME_GOLD], self.ref_idx[FRAME_PREV]):
            refi += 1
        for pli in range(3):
            self.buffers[refi].planes[pli][:] = out_planes[pli][-1]
        self.ref_idx[FRAME_PREV] = refi
        self.ref_idx[FRAME_SELF] = refi
        if last_intra is not None:
            gold_i = 0
            while gold_i in (refi,):
                gold_i += 1
            if last_intra == len(live) - 1:
                self.ref_idx[FRAME_GOLD] = refi
            else:
                for pli in range(3):
                    self.buffers[gold_i].planes[pli][:] = (
                        out_planes[pli][last_intra]
                    )
                self.ref_idx[FRAME_GOLD] = gold_i
        self._out_frame = self.buffers[refi]

        # Assemble display-orientation outputs (dup packets repeat).
        outs = []
        li = -1
        for fr in per_frame:
            if fr is not None:
                li += 1
            frame_out = []
            for pli in range(3):
                vpad, hpad = g.plane_padding(pli)
                h, w = g.plane_shape(pli)
                p = out_planes[pli][max(li, 0)][
                    vpad : vpad + h, hpad : hpad + w
                ]
                frame_out.append(p[::-1].copy())
            outs.append(frame_out)
        return outs
