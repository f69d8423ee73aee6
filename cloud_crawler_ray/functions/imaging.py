"""In-repo image codecs, perceptual hash and PSNR (numpy + stdlib only).

The graft payload is image+caption pairs (BASELINE.json ``input_hint``:
``(image_id, bytes, w, h, fmt, caption, phash)``). The sandbox has no Pillow
/ libpng, so the codecs are self-contained:

* ``raw``  — uncompressed interleaved RGB8 (h*w*3 bytes), lossless.
* ``png``  — real PNG (8-bit RGB, zlib DEFLATE, filter 0 written; filters
  0–4 decoded), lossless, readable by any external tool.
* ``q6``   — 6-bit-quantized raw (lossy stand-in; PSNR ≈ 46 dB, exercising
  the PSNR≥40dB per-row invariant path).

``phash`` is the classic 64-bit DCT perceptual hash (32×32 grayscale →
DCT-II → top-left 8×8 → median threshold), fully deterministic.

Real JPEG/WebP/video decode is out of sandbox scope; see
``stages/multimodal.py`` for the actor-pool plumbing with gated imports.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

FORMATS = ("raw", "png", "q6")

# ---------------------------------------------------------------- raw codec


def encode_raw(img: np.ndarray) -> bytes:
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3
    return img.tobytes()


def decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(data, np.uint8).reshape(h, w, 3)


# ----------------------------------------------------------------- q6 codec


def encode_q6(img: np.ndarray) -> bytes:
    """Quantize to 6 bits/channel (lossy, PSNR ≈ 46 dB) then store raw."""
    q = (img.astype(np.uint16) >> 2).astype(np.uint8)
    return q.tobytes()


def decode_q6(data: bytes, w: int, h: int) -> np.ndarray:
    q = np.frombuffer(data, np.uint8).reshape(h, w, 3).astype(np.uint16)
    # mid-rise reconstruction: x*4 + 2, clipped
    return np.minimum(q * 4 + 2, 255).astype(np.uint8)


# ----------------------------------------------------------------- png codec

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3
    h, w, _ = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    # filter byte 0 per scanline
    raw = np.empty((h, 1 + w * 3), np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos, w = 8, None
    idat = []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            assert bit_depth == 8 and color_type == 2 and interlace == 0, "unsupported PNG"
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    raw = zlib.decompress(b"".join(idat))
    stride = 1 + w * 3
    lines = np.frombuffer(raw, np.uint8).reshape(h, stride)
    out = np.zeros((h, w * 3), np.int16)
    prev = np.zeros(w * 3, np.int16)
    for y in range(h):  # scanline loop (unavoidable: filters chain row-to-row)
        f = lines[y, 0]
        cur = lines[y, 1:].astype(np.int16)
        if f == 0:
            row = cur
        elif f == 2:  # Up
            row = (cur + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth need left-to-right scan
            row = np.zeros(w * 3, np.int16)
            bpp = 3
            for x in range(w * 3):
                a = row[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                row[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = row
        prev = row
    return out.astype(np.uint8).reshape(h, w, 3)


# -------------------------------------------------------------- dispatchers


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw":
        return encode_raw(img)
    if fmt == "png":
        return encode_png(img)
    if fmt == "q6":
        return encode_q6(img)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    if fmt == "raw":
        return decode_raw(data, w, h)
    if fmt == "png":
        return decode_png(data)
    if fmt == "q6":
        return decode_q6(data, w, h)
    raise ValueError(f"unknown fmt {fmt!r}")


# ---------------------------------------------------------------- phash/psnr

_DCT32 = None


def _dct_basis(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)[:, None]
        x = np.arange(n)[None, :]
        m = np.sqrt(2.0 / n) * np.cos((2 * x + 1) * k * np.pi / (2 * n))
        m[0] /= np.sqrt(2.0)
        _DCT32 = m
    return _DCT32


def phash64(img: np.ndarray) -> int:
    """64-bit DCT perceptual hash → signed int64 (input_hint: phash:int64)."""
    h, w, _ = img.shape
    gray = img @ np.array([0.299, 0.587, 0.114])
    # deterministic nearest-neighbor resample to 32×32
    yi = np.floor(np.arange(32) * (h / 32.0)).astype(np.int64)
    xi = np.floor(np.arange(32) * (w / 32.0)).astype(np.int64)
    small = gray[yi][:, xi]
    d = _dct_basis(32)
    freq = d @ small @ d.T
    block = freq[:8, :8].ravel()
    med = np.median(block[1:])
    bits = (block > med).astype(np.uint64)
    val = np.uint64(0)
    for i in range(64):
        val = (val << np.uint64(1)) | bits[i]
    return int(val.astype(np.int64))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


# --------------------------------------------------- synthetic image payloads


def synth_image(seed: int, w: int, h: int) -> np.ndarray:
    """Deterministic PRF(seed) → smooth-ish RGB image (PSNR-meaningful).

    Single-pass float32 kernels (one sin over (h,w,3), one float32 normal
    draw) — ~3x cheaper and half the memory traffic of the per-channel
    float64 version, which mattered once 32 decode actors contended for
    bandwidth. Still a pure function of (seed, w, h).
    """
    rng = np.random.Generator(np.random.PCG64(seed & 0xFFFFFFFFFFFFFFFF))
    fx = rng.uniform(0.5, 3.0, 3).astype(np.float32)
    fy = rng.uniform(0.5, 3.0, 3).astype(np.float32)
    ph = rng.uniform(0, 2 * np.pi, 3).astype(np.float32)
    yy = (np.arange(h, dtype=np.float32) / np.float32(h))[:, None, None]
    xx = (np.arange(w, dtype=np.float32) / np.float32(w))[None, :, None]
    arg = np.float32(2 * np.pi) * (fx[None, None, :] * xx + fy[None, None, :] * yy) + ph[None, None, :]
    img = np.float32(127.5) + np.float32(90) * np.sin(arg)
    img += rng.standard_normal((h, w, 3), dtype=np.float32) * np.float32(8)
    return np.clip(img, 0, 255).astype(np.uint8)


def doc_phash64(doc_id: int) -> int:
    """The phash_neardup corpus definition: groups of 3 docs share a base
    image (doc_id // 3) with increasing planted noise (doc_id % 3). One
    shared definition so the Ray query and its DuckDB oracle dump hash the
    identical pixels — the oracle then independently re-derives the LSH
    banding / candidate join / Hamming verify in SQL."""
    base = synth_image(doc_id // 3, 32, 32)
    rng = np.random.Generator(np.random.PCG64(doc_id))
    amp = 2 * (doc_id % 3)
    noisy = np.clip(base.astype(np.int16) + rng.integers(-amp, amp + 1, base.shape), 0, 255)
    return phash64(noisy.astype(np.uint8))
