"""Minimal real PNG codec — stdlib ``zlib`` + numpy only.

The container ships no image libraries (PIL/cv2/imageio all absent —
probed round 2), but PNG itself is just zlib-inflated scanlines with five
per-row byte filters, so the decode stage of the multimodal pipeline can
be REAL for PNG payloads: parse chunks (CRC-checked), inflate IDAT,
unfilter rows (None/Sub/Up/Average/Paeth), reshape to uint8 pixels.

Supported subset (both directions): 8-bit depth, grayscale (color type
0), RGB (2), RGBA (6), non-interlaced. Everything else raises — callers
fall back to the documented deterministic stub for foreign payloads.
"""

from __future__ import annotations

import struct
import zlib
from typing import List

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body))
    )


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 array (h,w) gray / (h,w,3) RGB / (h,w,4) RGBA → PNG bytes.
    ``filter_type`` applies one filter to every scanline (any of 0..4 —
    useful for exercising every unfilter path in tests)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        ctype, ch = 0, 1
        rows = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        ctype, ch = 2, 3
        rows = img
    elif img.ndim == 3 and img.shape[2] == 4:
        ctype, ch = 6, 4
        rows = img
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = rows.shape[:2]
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        line = rows[y].reshape(-1)
        f = _apply_filter(filter_type, line, prev, ch)
        raw.append(filter_type)
        raw.extend(f.tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _apply_filter(ft: int, line: np.ndarray, prev: np.ndarray, ch: int) -> np.ndarray:
    a = np.zeros_like(line)
    a[ch:] = line[:-ch]
    b = prev
    c = np.zeros_like(prev)
    c[ch:] = prev[:-ch]
    if ft == 0:
        return line
    if ft == 1:
        return line - a
    if ft == 2:
        return line - b
    if ft == 3:
        return line - ((a.astype(np.uint16) + b.astype(np.uint16)) // 2).astype(np.uint8)
    if ft == 4:
        return line - _paeth(a, b, c)
    raise ValueError(f"bad filter {ft}")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    c16 = c.astype(np.int16)
    p = a16 + b16 - c16
    pa_ = np.abs(p - a16)
    pb = np.abs(p - b16)
    pc = np.abs(p - c16)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h,w) for grayscale else (h,w,channels)."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    ctype = None
    idat: List[bytes] = []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported color type {ctype}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    ch = _CHANNELS[ctype]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("scanline payload size mismatch")
    raw = raw.reshape(height, stride + 1)
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ft = int(raw[y, 0])
        line = raw[y, 1:].copy()
        if ft == 0:
            pass
        elif ft == 1:
            # Sub filter: out[x] = raw[x] + out[x-ch] is a prefix sum
            # per channel lane — one vectorized cumsum mod 256 per lane
            lanes = line.reshape(-1, ch)
            line = (
                np.cumsum(lanes.astype(np.int64), axis=0) & 0xFF
            ).astype(np.uint8).reshape(-1)
        elif ft == 2:
            line += prev  # array add wraps mod 256 — the PNG "Up" filter
        elif ft == 3:
            # Average filter: out[x] = raw[x] + (out[x-ch] + prev[x])>>1
            # has a true pixel-to-pixel dependence, but all ``ch`` lanes
            # of a pixel are independent — one numpy vector op per PIXEL
            # (not per byte), with the int64 lane views hoisted out
            lanes = line.reshape(-1, ch).astype(np.int64)
            pl = prev.reshape(-1, ch).astype(np.int64)
            left = np.zeros(ch, dtype=np.int64)
            for i in range(len(lanes)):
                left = (lanes[i] + ((left + pl[i]) >> 1)) & 0xFF
                lanes[i] = left
            line = lanes.astype(np.uint8).reshape(-1)
        elif ft == 4:
            # Paeth filter: same lane-wise pixel recurrence; b/c rows
            # (up, up-left) are pure prev-row data, precomputed whole-row
            lanes = line.reshape(-1, ch).astype(np.int64)
            pl = prev.reshape(-1, ch).astype(np.int64)
            plc = np.zeros_like(pl)  # prev[x-ch] per pixel
            plc[1:] = pl[:-1]
            left = np.zeros(ch, dtype=np.int64)
            for i in range(len(lanes)):
                b_, c_ = pl[i], plc[i]
                p = left + b_ - c_
                pa_ = np.abs(p - left)
                pb_ = np.abs(p - b_)
                pc_ = np.abs(p - c_)
                pred = np.where(
                    (pa_ <= pb_) & (pa_ <= pc_),
                    left,
                    np.where(pb_ <= pc_, b_, c_),
                )
                left = (lanes[i] + pred) & 0xFF
                lanes[i] = left
            line = lanes.astype(np.uint8).reshape(-1)
        else:
            raise ValueError(f"bad scanline filter {ft}")
        out[y] = line
        prev = line
    if ch == 1:
        return out.reshape(height, width)
    return out.reshape(height, width, ch)


def resize_nearest(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbor resize (real kernel, used for thumbnails)."""
    sh, sw = img.shape[:2]
    ys = (np.arange(h) * sh // h).clip(0, sh - 1)
    xs = (np.arange(w) * sw // w).clip(0, sw - 1)
    return img[ys][:, xs]


def to_gray(img: np.ndarray) -> np.ndarray:
    """Integer BT.601 luma for RGB/RGBA; identity for grayscale."""
    if img.ndim == 2:
        return img
    r = img[..., 0].astype(np.uint32)
    g = img[..., 1].astype(np.uint32)
    b = img[..., 2].astype(np.uint32)
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
