"""YUV4MPEG2 (.y4m) reader/writer (the interchange format the reference's
encoder_example/dump_video use)."""
from __future__ import annotations

import numpy as np


def read_y4m(path: str):
    """Returns (width, height, fps (num, den), frames list of [y, u, v])."""
    with open(path, "rb") as f:
        header = f.readline().decode("ascii", "replace").strip()
        if not header.startswith("YUV4MPEG2"):
            raise ValueError("not a y4m file")
        W = H = 0
        fps = (30, 1)
        fmt = "420"
        for tok in header.split()[1:]:
            if tok[0] == "W":
                W = int(tok[1:])
            elif tok[0] == "H":
                H = int(tok[1:])
            elif tok[0] == "F":
                n, d = tok[1:].split(":")
                fps = (int(n), int(d))
            elif tok[0] == "C":
                fmt = tok[1:]
        if not fmt.startswith("420"):
            raise NotImplementedError(f"y4m chroma format {fmt}")
        frames = []
        ysz, csz = W * H, (W // 2) * (H // 2)
        while True:
            line = f.readline()
            if not line:
                break
            if not line.startswith(b"FRAME"):
                raise ValueError("bad y4m frame marker")
            data = f.read(ysz + 2 * csz)
            if len(data) < ysz + 2 * csz:
                break
            y = np.frombuffer(data[:ysz], np.uint8).reshape(H, W)
            u = np.frombuffer(data[ysz : ysz + csz], np.uint8).reshape(
                H // 2, W // 2
            )
            v = np.frombuffer(data[ysz + csz :], np.uint8).reshape(
                H // 2, W // 2
            )
            frames.append([y, u, v])
        return W, H, fps, frames


def write_y4m(path: str, frames, fps=(30, 1)):
    H, W = frames[0][0].shape
    with open(path, "wb") as f:
        f.write(
            f"YUV4MPEG2 W{W} H{H} F{fps[0]}:{fps[1]} Ip A1:1 C420jpeg\n".encode()
        )
        for y, u, v in frames:
            f.write(b"FRAME\n")
            f.write(np.ascontiguousarray(y).tobytes())
            f.write(np.ascontiguousarray(u).tobytes())
            f.write(np.ascontiguousarray(v).tobytes())
