"""Rate control: 1-pass CBR with a leaky bit reservoir and a power-law
rate model, plus the 2-pass metrics file format.

Capability-equivalent redesign of the reference's controller (rate.c):
same structure -- a reservoir sized by the keyframe interval, a model
rate = scale * npixels * q^-exp per frame type with exponential-decay
followers tracking `scale`, frame dropping under pressure -- but in
straightforward float math instead of Q57 fixed point (the controller
output is encoder-side freedom; streams remain valid for any qi choices).
"""
from __future__ import annotations

import dataclasses
import struct

import numpy as np

INTRA = 0
INTER = 1


@dataclasses.dataclass
class FrameMetrics:
    frame_type: int
    log_scale: float
    dup_count: int = 0
    activity_avg: float = 0.0


class RateControl:
    def __init__(
        self,
        info,
        dequant,            # [64,3,2,64] dequant tables
        keyframe_freq: int,
        buf_delay: int | None = None,
    ):
        self.target_bitrate = info.target_bitrate
        fps = info.fps_numerator / info.fps_denominator
        self.bits_per_frame = info.target_bitrate / fps
        self.npixels = info.frame_width * info.frame_height
        # Reservoir sized by the keyframe interval (rate.c:245-317).
        self.buf_delay = buf_delay or max(keyframe_freq, 12)
        self.max_fullness = self.bits_per_frame * self.buf_delay
        self.fullness = self.max_fullness * 0.5
        self.keyframe_freq = keyframe_freq
        # Per-qi log quantizer averages from the dequant tables (the
        # enquant.c:328 qavg analogue; uniform AC weighting).
        lq = np.log(
            np.maximum(dequant[:, 0, :, 1:].astype(np.float64), 1.0)
        ).mean(axis=2)
        self.log_qavg = lq  # [64][2] -> indexed [qi][qti]
        # Rate model: bits = scale * npixels * q^-exp (per frame type).
        self.exp = [1.0, 1.4]         # intra, inter exponents
        self.scale = [None, None]     # initialized from first observation
        self.follower_alpha = 0.25
        self.prev_qi = [None, None]
        self.ndrops = 0
        self.max_consecutive_drops = keyframe_freq - 1 if keyframe_freq > 1 else 0
        self.frame_metrics: list[FrameMetrics] = []

    # ------------------------------------------------------------------
    def set_twopass_metrics(self, metrics: list[FrameMetrics]) -> None:
        """Enable pass-2 allocation from pass-1 metrics: per-frame budgets
        proportional to measured complexity (exp of log_scale), the analogue
        of oc_enc_select_qi's 2-pass case (rate.c:506-625)."""
        self._tp_metrics = metrics
        self._tp_index = 0
        w = np.array([np.exp(m.log_scale) for m in metrics])
        self._tp_weights = w / max(w.sum(), 1e-12)
        self._tp_total_bits = self.bits_per_frame * len(metrics)

    # ------------------------------------------------------------------
    def select_qi(self, frame_type: int, prev_qi: int) -> int:
        """Choose qi for the next frame from the reservoir state
        (the oc_enc_select_qi analogue, rate.c:463-730)."""
        # Bit budget: steady-state share plus a correction pulling the
        # reservoir back to half full over the buffer delay.
        correction = (self.fullness - 0.5 * self.max_fullness) / self.buf_delay
        target = self.bits_per_frame + correction
        if getattr(self, "_tp_metrics", None) is not None:
            # 2-pass: complexity-proportional allocation with a reservoir
            # correction.
            i = min(self._tp_index, len(self._tp_weights) - 1)
            self._tp_index += 1
            target = self._tp_total_bits * self._tp_weights[i] + correction
        elif frame_type == INTRA:
            # Keyframes get a multiple of the per-frame budget, bounded by
            # the reservoir (rate.c:506-625 targets keyframe boundaries).
            target = min(
                self.bits_per_frame * min(self.keyframe_freq, 8),
                self.fullness * 0.6 + self.bits_per_frame,
            )
        target = max(target, self.bits_per_frame * 0.125)
        qti = 0 if frame_type == INTRA else 1
        if self.scale[qti] is None:
            # No model yet: start from the other type's model if present,
            # else a mid-range qi; the first update() calibrates.
            other = 1 - qti
            if self.scale[other] is not None and self.prev_qi[other] is not None:
                return self.prev_qi[other]
            return 40 if prev_qi is None else prev_qi
        # Invert the model for log q, then pick the nearest qi.
        log_q = (
            np.log(self.scale[qti] * self.npixels) - np.log(target)
        ) / self.exp[qti]
        qi = int(np.argmin(np.abs(self.log_qavg[:, qti] - log_q)))
        # Clamp the step to keep quality changes smooth (the reference's
        # 2nd-order followers have the same effect, rate.c:54-128) -- but
        # let big model errors through so recovery is fast.
        if self.prev_qi[qti] is not None:
            step = 6 if abs(qi - self.prev_qi[qti]) < 16 else 16
            qi = int(
                np.clip(qi, self.prev_qi[qti] - step, self.prev_qi[qti] + step)
            )
        return qi

    # ------------------------------------------------------------------
    def update(self, frame_type: int, qi: int, bits: int) -> None:
        """Post-frame model/reservoir update (oc_enc_update_rc_state,
        rate.c:731-870)."""
        qti = 0 if frame_type == INTRA else 1
        if bits > 0:
            q = np.exp(self.log_qavg[qi, qti])
            measured = bits * (q ** self.exp[qti]) / self.npixels
            if self.scale[qti] is None:
                self.scale[qti] = measured
            else:
                a = self.follower_alpha
                self.scale[qti] = (1 - a) * self.scale[qti] + a * measured
            self.prev_qi[qti] = qi
            self.frame_metrics.append(
                FrameMetrics(frame_type, float(np.log(max(measured, 1e-12))))
            )
        self.fullness += self.bits_per_frame - bits
        self.fullness = min(self.fullness, self.max_fullness)

    # ------------------------------------------------------------------
    def should_drop(self, frame_type: int) -> bool:
        """Drop (emit a 0-byte dup) when the reservoir is exhausted
        (rate.c:731-870 drop logic)."""
        if frame_type == INTRA:
            return False
        if self.fullness > self.bits_per_frame * 0.25:
            self.ndrops = 0
            return False
        if self.ndrops >= self.max_consecutive_drops:
            self.ndrops = 0
            return False
        self.ndrops += 1
        return True

    # ------------------------------------------------------------------
    # 2-pass metrics serialization: same container format as the reference
    # ("OT2P" magic + per-frame records; rate.c:878-936) so external tooling
    # recognizes the files, with our scale metric in the payload.
    MAGIC = 0x5032544F  # "OT2P"

    def twopass_out_header(self) -> bytes:
        return struct.pack("<II", self.MAGIC, 1)

    def twopass_out_frame(self, m: FrameMetrics) -> bytes:
        word0 = (m.dup_count & 0x7FFFFFFF) | (
            0x80000000 if m.frame_type == INTRA else 0
        )
        log_scale_q24 = int(np.clip(m.log_scale * (1 << 24), -(2**31), 2**31 - 1))
        activity = int(np.clip(m.activity_avg, 0, 2**32 - 1))
        return struct.pack("<IiI", word0, log_scale_q24, activity)

    def twopass_out_summary(self) -> bytes:
        nframes = [0, 0]
        for m in self.frame_metrics:
            nframes[m.frame_type] += 1
        return struct.pack(
            "<II", nframes[INTRA], nframes[INTER]
        )

    @classmethod
    def twopass_parse(cls, data: bytes):
        magic, version = struct.unpack_from("<II", data, 0)
        if magic != cls.MAGIC:
            raise ValueError("bad 2-pass magic")
        out = []
        off = 8
        while off + 12 <= len(data) - 8:
            word0, ls, act = struct.unpack_from("<IiI", data, off)
            off += 12
            out.append(
                FrameMetrics(
                    INTRA if word0 & 0x80000000 else INTER,
                    ls / (1 << 24),
                    word0 & 0x7FFFFFFF,
                    act,
                )
            )
        return out
