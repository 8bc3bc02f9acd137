"""Minimal self-contained image codecs for the multimodal pipeline.

The runtime container has no media libraries, so rather than stubbing
the decode step (rounds 1-2), decode is REAL for the two formats that
need only the standard library + numpy:

* PNG (8-bit RGB / RGBA / grayscale, non-interlaced) — zlib inflate +
  scanline unfiltering per the PNG spec §9 (the filter algebra is pure
  numpy);
* BMP (24/32-bit uncompressed BI_RGB) — header arithmetic only.

When Pillow IS importable it is preferred (it covers JPEG etc.); these
decoders are the fallback, not a replacement.  Everything operates on
`bytes` in, `numpy.ndarray` (H, W, 3) uint8 out, so the Arrow-batched
`mapInPandas` plumbing in multimodal.py stays identical either way.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _try_pil_decode(content: bytes):
    try:
        import io

        from PIL import Image  # noqa: PLC0415 — optional dependency

        img = Image.open(io.BytesIO(content)).convert("RGB")
        return np.asarray(img, dtype=np.uint8)
    except ImportError:
        return None


def decode_png(content: bytes) -> np.ndarray:
    """PNG → (H, W, 3) uint8.  Supports bit depth 8, color types 0
    (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA); no interlacing."""
    if content[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    color_type = None
    idat = b""
    while pos < len(content):
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    raw = zlib.decompress(idat)
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = arr[:, 0]
    lines = arr[:, 1:].astype(np.int16)
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(height):
        f = filters[y]
        cur = lines[y].copy()
        prev = out[y - 1].astype(np.int16) if y else np.zeros(stride, dtype=np.int16)
        if f == 0:  # None
            rec = cur
        elif f == 1:  # Sub — sequential left dependency
            rec = cur
            for x in range(bpp, stride):
                rec[x] = (rec[x] + rec[x - bpp]) & 0xFF
        elif f == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif f == 3:  # Average
            rec = cur
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = cur
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = rec.astype(np.uint8)
    px = out.reshape(height, width, channels)
    if color_type == 0:
        return np.repeat(px, 3, axis=2)
    if color_type == 2:
        return px
    if color_type == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # RGBA → RGB


def encode_png(px: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → PNG bytes (filter 0, one zlib stream)."""
    h, w, _ = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    idat = zlib.compress(raw)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def decode_bmp(content: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP → (H, W, 3) uint8."""
    if content[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack("<I", content[10:14])
    (hdr_size,) = struct.unpack("<I", content[14:18])
    if hdr_size < 40:
        raise ValueError("BMP core header unsupported")
    width, height = struct.unpack("<ii", content[18:26])
    bpp, compression = struct.unpack("<HI", content[28:34])
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    nch = bpp // 8
    flipped = height > 0
    height = abs(height)
    stride = (width * nch + 3) & ~3
    rows = []
    for y in range(height):
        line = content[data_off + y * stride : data_off + y * stride + width * nch]
        row = np.frombuffer(line, dtype=np.uint8).reshape(width, nch)
        rows.append(row[:, 2::-1])  # BGR(A) → RGB
    px = np.stack(rows)
    return px[::-1] if flipped else px


def decode_image(content: bytes) -> np.ndarray:
    """bytes → (H, W, 3) uint8.  Pillow when available, else the
    stdlib PNG/BMP decoders above."""
    via_pil = _try_pil_decode(content)
    if via_pil is not None:
        return via_pil
    if content[:8] == _PNG_SIG:
        return decode_png(content)
    if content[:2] == b"BM":
        return decode_bmp(content)
    raise ValueError(
        "unsupported image format (PNG/BMP decode is built in; install "
        "Pillow for JPEG and other formats)"
    )


def resize_nearest(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbour resample via integer index maps — pure numpy."""
    h, w, _ = px.shape
    ys = (np.arange(height) * (h / height)).astype(np.int64).clip(0, h - 1)
    xs = (np.arange(width) * (w / width)).astype(np.int64).clip(0, w - 1)
    return px[ys][:, xs]


def image_features(px: np.ndarray, dim: int = 16) -> list[float]:
    """Deterministic content features: geometry + per-channel moments +
    a coarse luminance histogram, padded/truncated to `dim`."""
    h, w, _ = px.shape
    f = px.astype(np.float32) / 255.0
    lum = f @ np.asarray([0.299, 0.587, 0.114], dtype=np.float32)
    hist, _ = np.histogram(lum, bins=8, range=(0.0, 1.0))
    hist = hist / max(1, lum.size)
    feats = [
        float(np.log1p(w)),
        float(np.log1p(h)),
        float(w / max(1, h)),
        *[float(f[:, :, c].mean()) for c in range(3)],
        *[float(f[:, :, c].std()) for c in range(3)],
        *[float(v) for v in hist],
    ]
    if len(feats) < dim:
        feats += [0.0] * (dim - len(feats))
    return feats[:dim]
