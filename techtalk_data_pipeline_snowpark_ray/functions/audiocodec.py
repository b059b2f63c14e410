"""Pure-stdlib/numpy WAV (RIFF PCM) codec.

The container has no audio libraries, so the engine carries its own
minimal codec for the one container format that needs none: RIFF WAVE
with 16-bit little-endian PCM. Mirrors `imagecodec.py`'s role for
BMP/PNG: synthetic media rows carry REAL encoded payloads and the
decode stage is a real parser, not a fake (reference boundary:
the ingest utilities treat payloads as opaque bytes end-to-end,
tt-dps-pipeline-rest/.../utils/HttpClientUtils.scala:24-75; decoding
is new engine surface mandated by the multimodal operator suite).

Scope (asserted, never silently widened): mono or multi-channel
16-bit PCM (format tag 1). Anything else raises ValueError loudly.
"""

from __future__ import annotations

import struct

import numpy as np

_RIFF = b"RIFF"
_WAVE = b"WAVE"
_FMT = b"fmt "
_DATA = b"data"


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 samples (1-D mono, or 2-D (n, channels)) as a
    standard 44-byte-header RIFF/WAVE PCM file."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        n_channels = 1
    elif s.ndim == 2:
        n_channels = s.shape[1]
    else:
        raise ValueError(f"samples must be 1-D or 2-D, got {s.ndim}-D")
    data = s.tobytes()
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate,
                      block_align, 16)
    return b"".join([
        _RIFF, struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)), _WAVE,
        _FMT, struct.pack("<I", len(fmt)), fmt,
        _DATA, struct.pack("<I", len(data)), data,
    ])


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE PCM16 payload -> (samples, sample_rate).

    Walks the chunk list properly (extra chunks like LIST/fact are
    skipped), so files from other writers parse too. Mono returns a
    1-D int16 array; multi-channel returns (n, channels).
    """
    if len(payload) < 12 or payload[:4] != _RIFF or payload[8:12] != _WAVE:
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= end:
        tag = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + size]
        if tag == _FMT:
            fmt = body
        elif tag == _DATA:
            data = body
        pos += 8 + size + (size & 1)        # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(fmt) < 16:
        # struct.error is outside the module's ValueError contract
        raise ValueError(f"WAV fmt chunk truncated ({len(fmt)} bytes)")
    audio_format, n_channels, sample_rate, _br, _ba, bits = \
        struct.unpack_from("<HHIIHH", fmt)
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"only 16-bit PCM supported (format={audio_format}, "
            f"bits={bits})")
    if n_channels <= 0:
        raise ValueError(f"bad WAV channel count {n_channels}")
    samples = np.frombuffer(data[:len(data) - len(data) % (2 * n_channels)],
                            dtype="<i2")
    if n_channels > 1:
        samples = samples.reshape(-1, n_channels)
    return samples, int(sample_rate)
