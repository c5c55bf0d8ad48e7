"""Minimal dependency-free WAV read/write (PCM_16, PCM_24, PCM_32, FLOAT).

Replaces the reference's ``soundfile`` usage (simulate.py:104-107,432-438,
data.py) — soundfile/libsndfile is not available in this environment.
"""

from __future__ import annotations

import struct

import numpy as np

_SUBTYPE_BITS = {"PCM_16": 16, "PCM_24": 24, "PCM_32": 32, "FLOAT": 32}


def write(path, data, sr, subtype="PCM_16"):
    """Write a mono/multi-channel WAV file.

    ``data``: (n,) or (n, ch) float array in [-1, 1] (clipped like libsndfile).
    """
    data = np.asarray(data)
    if data.ndim == 1:
        data = data[:, None]
    n, ch = data.shape
    bits = _SUBTYPE_BITS[subtype]
    block = ch * bits // 8

    if subtype == "FLOAT":
        fmt_tag = 3
        payload = data.astype("<f4").tobytes()
    else:
        fmt_tag = 1
        clipped = np.clip(data.astype(np.float64), -1.0, 1.0)
        if subtype == "PCM_16":
            ints = np.round(clipped * 32767.0).astype("<i2")
            payload = ints.tobytes()
        elif subtype == "PCM_32":
            ints = np.round(clipped * 2147483647.0).astype("<i4")
            payload = ints.tobytes()
        else:  # PCM_24: 3-byte little-endian from the top 3 bytes of int32
            ints = np.round(clipped * 8388607.0).astype("<i4")
            b = ints.view(np.uint8).reshape(-1, 4)
            payload = np.ascontiguousarray(b[:, :3]).tobytes()

    hdr = b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, fmt_tag, ch, sr, sr * block, block, bits
    )
    hdr += b"data" + struct.pack("<I", len(payload))
    with open(path, "wb") as f:
        f.write(hdr + payload)


def read(path, dtype=np.float64):
    """Read a WAV file -> (data, sr); data is (n,) mono or (n, ch) float."""
    with open(path, "rb") as f:
        raw = f.read()
    assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE", path
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        size = struct.unpack("<I", raw[pos + 4 : pos + 8])[0]
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    assert fmt is not None and data is not None, path
    fmt_tag, ch, sr, _, block, bits = fmt
    if fmt_tag == 3:
        out = np.frombuffer(data, "<f4").astype(dtype)
    elif bits == 16:
        out = np.frombuffer(data, "<i2").astype(dtype) / 32767.0
    elif bits == 32:
        out = np.frombuffer(data, "<i4").astype(dtype) / 2147483647.0
    elif bits == 24:
        b = np.frombuffer(data, np.uint8).reshape(-1, 3)
        i4 = np.zeros((b.shape[0], 4), np.uint8)
        i4[:, 1:] = b
        out = i4.view("<i4")[:, 0].astype(dtype) / (8388607.0 * 256.0)
    else:
        raise ValueError(f"unsupported wav: {fmt}")
    out = out.reshape(-1, ch)
    return (out[:, 0] if ch == 1 else out), sr
