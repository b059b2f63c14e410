"""Pure-stdlib/numpy Y4M (YUV4MPEG2) codec.

Y4M is the standard UNCOMPRESSED video interchange container (the
format ffmpeg/mjpegtools pipe raw video through): a plain-text stream
header, then one `FRAME` marker + raw plane bytes per frame. Because
there is no entropy coding, a correct parser needs no codec library --
so this is the honest way to make the engine's VIDEO decode step real
in a container with no av libs, completing the imagecodec (BMP/PNG) /
audiocodec (WAV) trio. Compressed codecs (H.264 & co) remain out of
scope and fail loudly at the format check, never a silent fake.
(Reference boundary: payloads are opaque bytes end-to-end in the
reference's ingest utilities, HttpClientUtils.scala:24-75; decoding is
new engine surface mandated by the multimodal operator suite.)

Scope: `Cmono` (one grayscale plane per frame) and `C420`-family
(Y plane used, chroma skipped) colorspaces; anything else raises.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"


def encode_y4m_mono(frames: np.ndarray, fps: int = 25) -> bytes:
    """Encode (n_frames, h, w) uint8 grayscale frames as Y4M Cmono."""
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    if f.ndim != 3:
        raise ValueError(f"frames must be (n, h, w), got {f.shape}")
    n, h, w = f.shape
    head = b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 Cmono\n" % (w, h, fps)
    out = [head]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(f[i].tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a Y4M payload -> ((n_frames, h, w) uint8 luma, fps).

    Parses the real header grammar (space-separated tagged params,
    unknown tags like X-metadata skipped) and per-frame parameter
    lines; for C420 colorspaces the chroma planes are skipped and the
    luma plane returned.
    """
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(_MAGIC):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = 0
    fps = 25
    cs = b"420"                      # Y4M default colorspace
    for tok in payload[len(_MAGIC):nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = val.split(b":")
            if int(den) <= 0:
                raise ValueError(f"bad Y4M frame rate {val.decode()!r}")
            fps = int(round(int(num) / int(den)))
        elif tag == b"C":
            cs = val
    if w <= 0 or h <= 0:
        raise ValueError("Y4M header missing W/H")
    if cs == b"mono":
        frame_bytes = w * h
    elif cs in (b"420", b"420jpeg", b"420mpeg2", b"420paldv"):
        # exact 8-bit 4:2:0 variants only: a loose startswith(b"420")
        # would accept C420p10/C420p16 (2 bytes/sample), compute the
        # wrong frame size and die mid-stream with a misleading
        # corruption error instead of this format rejection
        frame_bytes = w * h + 2 * ((w // 2) * (h // 2))
    else:
        raise ValueError(
            f"unsupported Y4M colorspace C{cs.decode()} (mono/420 only; "
            "compressed codecs need an av library and stay out of scope)")
    frames = []
    pos = nl + 1
    end = len(payload)
    while pos < end:
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at offset {pos}")
        fnl = payload.find(b"\n", pos)
        if fnl < 0:
            raise ValueError("truncated FRAME header")
        pos = fnl + 1
        if pos + frame_bytes > end:
            raise ValueError("truncated frame data")
        luma = np.frombuffer(payload, np.uint8, w * h, pos).reshape(h, w)
        frames.append(luma)
        pos += frame_bytes
    if not frames:
        return np.empty((0, h, w), np.uint8), fps
    return np.stack(frames), fps
