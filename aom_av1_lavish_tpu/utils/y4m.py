"""Y4M (YUV4MPEG2) file read/write (reference behavior: common/y4minput.c).

Frames are planar numpy arrays (y, u, v) in uint8 (8-bit) or uint16.
"""

from __future__ import annotations

import numpy as np


def write_y4m(path: str, frames, width: int, height: int,
              fps=(30, 1), subsampling: str = "420") -> None:
    """frames: iterable of (y, u, v) uint8 arrays."""
    tag = {"420": "420jpeg", "422": "422", "444": "444"}[subsampling]
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} "
                f"Ip A0:0 C{tag}\n".encode())
        for y, u, v in frames:
            f.write(b"FRAME\n")
            f.write(np.ascontiguousarray(y, dtype=np.uint8).tobytes())
            f.write(np.ascontiguousarray(u, dtype=np.uint8).tobytes())
            f.write(np.ascontiguousarray(v, dtype=np.uint8).tobytes())


def read_y4m(path: str):
    """Return (frames, width, height, subsampling); frames = list of (y,u,v)."""
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"\n"):
            header += f.read(1)
        fields = header.decode().split()
        assert fields[0] == "YUV4MPEG2"
        width = height = None
        sub = "420"
        for fd in fields[1:]:
            if fd[0] == "W":
                width = int(fd[1:])
            elif fd[0] == "H":
                height = int(fd[1:])
            elif fd[0] == "C":
                if fd[1:].startswith("420"):
                    sub = "420"
                elif fd[1:].startswith("422"):
                    sub = "422"
                elif fd[1:].startswith("444"):
                    sub = "444"
        sx = 2 if sub in ("420", "422") else 1
        sy = 2 if sub == "420" else 1
        cw, ch = (width + sx - 1) // sx, (height + sy - 1) // sy
        frames = []
        while True:
            line = b""
            ch_ = f.read(1)
            if not ch_:
                break
            line += ch_
            while not line.endswith(b"\n"):
                line += f.read(1)
            assert line.startswith(b"FRAME")
            y = np.frombuffer(f.read(width * height), dtype=np.uint8)
            u = np.frombuffer(f.read(cw * ch), dtype=np.uint8)
            v = np.frombuffer(f.read(cw * ch), dtype=np.uint8)
            frames.append((y.reshape(height, width), u.reshape(ch, cw),
                           v.reshape(ch, cw)))
        return frames, width, height, sub
