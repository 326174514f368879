"""Pure-stdlib media codecs: PNG (zlib + struct) and WAV (wave).

The sandbox ships no codec *libraries* (PIL/imageio/cv2/soundfile), but a
PNG is zlib-deflated filtered scanlines inside CRC'd chunks and a WAV is a
RIFF header over PCM frames — both fully decodable with the stdlib.  These
codecs make the multimodal pipeline's DECODE step real (see
:mod:`spatialgraft.pipeline.multimodal`): bytes are actually encoded,
shipped through Arrow as a ``binary`` column, and actually decoded; the
DuckDB oracle predicts the decoded statistics from the same deterministic
integer arithmetic that generated the pixels/samples, so a bug in EITHER
direction of EITHER codec breaks the bit-exact match.

Scope (asserted, not silently wrong): PNG 8-bit greyscale / RGB / RGBA,
non-interlaced, all five scanline filters (None/Sub/Up/Average/Paeth) on
both encode and decode; WAV 16-bit little-endian PCM, any channel count.

Reference parity: the reference treats media as opaque payloads next to
spatial data (SURVEY §2.10); decoding media columns at scale is the
training-data-pipeline extension the build brief names.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color types with 8-bit depth: greyscale, truecolor, truecolor+alpha
_CHANNELS = {0: 1, 2: 3, 6: 4}
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data)))


def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (RFC 2083 §6.6) on int16+ arrays."""
    p = a.astype(np.int16) + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a,
                    np.where(pb <= pc, b, c)).astype(np.uint8)


def png_encode(pixels: np.ndarray, row_filters=None) -> bytes:
    """Encode an (h, w) or (h, w, 3|4) uint8 array as a PNG.

    row_filters: per-row filter ids 0..4 (default all 0).  Forward
    filtering predicts from the ORIGINAL bytes (lossless recon == raw),
    so every filter vectorizes."""
    pix = np.ascontiguousarray(pixels, dtype=np.uint8)
    if pix.ndim == 2:
        pix = pix[:, :, None]
    h, w, nch = pix.shape
    color_type = _COLOR_TYPE[nch]
    flat = pix.reshape(h, w * nch).astype(np.int16)
    prev = np.vstack([np.zeros((1, w * nch), np.int16), flat[:-1]])
    left = np.hstack([np.zeros((h, nch), np.int16), flat[:, :-nch]])
    upleft = np.hstack([np.zeros((h, nch), np.int16), prev[:, :-nch]])
    if row_filters is None:
        row_filters = [0] * h
    out = bytearray()
    for r in range(h):
        f = int(row_filters[r])
        raw = flat[r]
        if f == 0:
            enc = raw
        elif f == 1:
            enc = raw - left[r]
        elif f == 2:
            enc = raw - prev[r]
        elif f == 3:
            enc = raw - (left[r] + prev[r]) // 2
        elif f == 4:
            enc = raw - _paeth_vec(left[r].astype(np.uint8),
                                   prev[r].astype(np.uint8),
                                   upleft[r].astype(np.uint8))
        else:
            raise ValueError(f"bad PNG filter {f}")
        out.append(f)
        out += (enc % 256).astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(out), 6))
            + _chunk(b"IEND", b""))


# The Average/Paeth defilter below is an inherently sequential per-byte
# Python loop (each byte depends on the previous reconstructed byte) —
# fine for the <= 16x16 synthetic payloads this pipeline ships
# (config.MEDIA_MAX_PIXELS), NOT for production rasters.  The guard makes
# that scope explicit instead of silently decoding a megapixel image at
# Python speed; swap in a real codec library (PIL/libpng binding) behind
# png_decode for production-scale images (VERDICT r6 item 5).
PY_DEFILTER_MAX_BYTES = 1 << 16


def png_decode(data: bytes) -> np.ndarray:
    """Decode a PNG produced by any encoder within the stated scope.
    Returns (h, w) uint8 for greyscale, (h, w, ch) otherwise.

    Not for production rasters: Average/Paeth rows defilter in a
    per-byte Python loop (bounded by PY_DEFILTER_MAX_BYTES); the
    documented swap-in point for a C codec at scale."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = bytearray()
    while pos < len(data):
        (ln,), tag = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        if struct.unpack(">I", data[pos + 8 + ln:pos + 12 + ln])[0] \
                != zlib.crc32(tag + body):
            raise ValueError(f"CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8 or color_type not in _CHANNELS or interlace:
                raise ValueError(
                    f"unsupported PNG shape: depth={depth} "
                    f"color={color_type} interlace={interlace}")
            nch = _CHANNELS[color_type]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * nch
    if h * stride > PY_DEFILTER_MAX_BYTES:
        raise ValueError(
            f"image {w}x{h}x{nch} exceeds the pure-Python defilter scope "
            f"({PY_DEFILTER_MAX_BYTES} bytes) — swap in a C codec "
            "(see module docstring)")
    if len(raw) != h * (stride + 1):
        raise ValueError("bad scanline payload length")
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters, enc = rows[:, 0], rows[:, 1:]
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for r in range(h):
        f, line = int(filters[r]), enc[r]
        if f == 0:
            rec = line.copy()
        elif f == 2:
            rec = line + prev
        elif f == 1:
            # recon[i] = line[i] + recon[i-nch]: per-channel cumsum mod 256
            rec = np.empty(stride, np.uint8)
            for ch in range(nch):
                rec[ch::nch] = np.cumsum(
                    line[ch::nch], dtype=np.uint64) % 256
        elif f in (3, 4):
            rec = np.empty(stride, np.uint8)
            for i in range(stride):
                a = rec[i - nch] if i >= nch else 0
                b = prev[i]
                if f == 3:
                    rec[i] = (int(line[i]) + (int(a) + int(b)) // 2) % 256
                else:
                    c = prev[i - nch] if i >= nch else 0
                    p = int(a) + int(b) - int(c)
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else \
                        (b if pb <= pc else c)
                    rec[i] = (int(line[i]) + int(pred)) % 256
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[r] = rec
        prev = rec
    return out if nch == 1 else out.reshape(h, w, nch)


def wav_encode(samples: np.ndarray, sample_rate: int,
               n_channels: int = 1) -> bytes:
    """int16 PCM samples (frame-major interleaved) -> WAV bytes."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(n_channels)
        wv.setsampwidth(2)
        wv.setframerate(sample_rate)
        wv.writeframes(np.ascontiguousarray(
            samples, dtype="<i2").tobytes())
    return buf.getvalue()


def wav_decode(data: bytes) -> tuple[int, int, np.ndarray]:
    """WAV bytes -> (sample_rate, n_channels, int16 samples)."""
    with wave.open(io.BytesIO(data), "rb") as wv:
        if wv.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM supported")
        frames = wv.readframes(wv.getnframes())
        return (wv.getframerate(), wv.getnchannels(),
                np.frombuffer(frames, "<i2").copy())
