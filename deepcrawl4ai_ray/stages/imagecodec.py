"""REAL image codecs for the multimodal path — pure-numpy decoders for
the two standard UNCOMPRESSED raster formats, so the image pipeline has
a genuine decode member in this no-PIL sandbox (the compressed formats
— JPEG/PNG — remain the documented stub in stages/multimodal.py):

* **PPM (P6)** — Netpbm binary RGB: ASCII header ``P6 <w> <h> <maxval>``
  then ``w*h*3`` bytes, row-major top-down.
* **BMP (24-bit BITMAPINFOHEADER)** — 14-byte file header + 40-byte DIB
  header; rows are BGR, padded to 4-byte multiples, stored BOTTOM-UP
  when height is positive (the common layout).

Both writers/readers round-trip bit-exactly (tested), and the decode
stage verifies a stored pixel digest per image — the WARC-payload-digest
discipline applied to media payloads: a corrupted or mis-parsed image
flips ``pix_ok`` instead of silently yielding garbage features.

Reference parity: the ``result.media`` images the reference forwards
untouched (triggers.py:221-225) become decodable binary columns here.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


class ImageFormatError(ValueError):
    """Malformed PPM/BMP payload (bad magic, truncated pixel data)."""


# ----------------------------------------------------------------- PPM --

def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6, maxval 255)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"need (h, w, 3) RGB, got {a.shape}")
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8.  Handles comment lines and
    arbitrary whitespace per the Netpbm spec."""
    if not payload.startswith(b"P6"):
        raise ImageFormatError("not a P6 PPM (bad magic)")
    # tokenize header: three ints after the magic, '#' starts a comment
    pos = 2
    vals: list[int] = []
    n = len(payload)
    while len(vals) < 3:
        while pos < n and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < n and payload[pos : pos + 1] == b"#":
            while pos < n and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < n and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ImageFormatError("truncated PPM header")
        try:
            vals.append(int(payload[start:pos]))
        except ValueError:
            raise ImageFormatError(f"bad PPM header token {payload[start:pos]!r}")
    w, h, maxval = vals
    if maxval != 255:
        raise ImageFormatError(f"only maxval 255 supported, got {maxval}")
    pos += 1  # single whitespace byte after maxval
    need = w * h * 3
    pix = payload[pos : pos + need]
    if len(pix) != need:
        raise ImageFormatError(f"truncated PPM pixels: want {need}, got {len(pix)}")
    return np.frombuffer(pix, dtype=np.uint8).reshape(h, w, 3)


# ----------------------------------------------------------------- BMP --

def encode_bmp24(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit bottom-up BMP (BITMAPINFOHEADER)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"need (h, w, 3) RGB, got {a.shape}")
    h, w, _ = a.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + dib + data


def decode_bmp24(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (h, w, 3) uint8 RGB (bottom-up or
    top-down per the height sign)."""
    if not payload.startswith(b"BM"):
        raise ImageFormatError("not a BMP (bad magic)")
    if len(payload) < 54:
        raise ImageFormatError("truncated BMP header")
    (off,) = struct.unpack_from("<I", payload, 10)
    dib_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    (comp,) = struct.unpack_from("<I", payload, 30)
    if dib_size < 40 or planes != 1 or bpp != 24 or comp != 0:
        raise ImageFormatError(
            f"unsupported BMP (dib={dib_size}, planes={planes}, bpp={bpp}, comp={comp})"
        )
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    need = stride * h
    data = payload[off : off + need]
    if len(data) != need:
        raise ImageFormatError(f"truncated BMP pixels: want {need}, got {len(data)}")
    rows = np.frombuffer(data, dtype=np.uint8).reshape(h, stride)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img if top_down else img[::-1]


# ------------------------------------------------------------- generic --

def decode_image(payload: bytes) -> tuple[str, np.ndarray]:
    """Sniff + decode → (format, (h, w, 3) uint8).  Raises
    ImageFormatError for compressed/unknown formats (the stub's domain)."""
    if payload[:2] == b"P6":
        return "ppm", decode_ppm(payload)
    if payload[:2] == b"BM":
        return "bmp", decode_bmp24(payload)
    raise ImageFormatError(f"unknown/unsupported image magic {payload[:4]!r}")


def resize_nearest(arr: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index maps (pure numpy)."""
    sh, sw = arr.shape[:2]
    yi = (np.arange(h) * sh // h).clip(0, sh - 1)
    xi = (np.arange(w) * sw // w).clip(0, sw - 1)
    return arr[yi][:, xi]


def pixel_md5(arr: np.ndarray) -> str:
    """md5 of the raw RGB byte stream — the fidelity digest the decode
    stage re-checks (stored by the fixture generator at encode time)."""
    return hashlib.md5(np.ascontiguousarray(arr, dtype=np.uint8).tobytes()).hexdigest()


class RealImageDecodeStage:
    """Actor-pool stage over REAL encoded payloads: binary → (width,
    height, fmt, pix_md5, pix_ok) where ``pix_ok`` verifies the decoded
    pixel digest against a stored expectation column (payload-digest
    discipline).  Undecodable payloads yield fmt='error' and pix_ok
    False rather than poisoning the batch."""

    def __init__(
        self,
        payload_col: str = "payload",
        id_col: str = "doc_id",
        digest_col: str | None = "pix_md5_expected",
    ):
        self.payload_col = payload_col
        self.id_col = id_col
        self.digest_col = digest_col

    def __call__(self, batch):
        import pyarrow as pa

        payloads = batch[self.payload_col].to_pylist()
        expected = (
            batch[self.digest_col].to_pylist()
            if self.digest_col and self.digest_col in batch.schema.names
            else [None] * len(payloads)
        )
        n = len(payloads)
        w = np.zeros(n, dtype=np.int64)
        h = np.zeros(n, dtype=np.int64)
        fmts: list[str] = []
        digests: list[str] = []
        oks = np.zeros(n, dtype=bool)
        for i, (p, exp) in enumerate(zip(payloads, expected)):
            try:
                fmt, arr = decode_image(p)
            except ImageFormatError:
                fmts.append("error")
                digests.append("")
                continue
            fmts.append(fmt)
            h[i], w[i] = arr.shape[:2]
            d = pixel_md5(arr)
            digests.append(d)
            oks[i] = (exp is None) or (d == exp)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "width": pa.array(w, pa.int64()),
                "height": pa.array(h, pa.int64()),
                "fmt": pa.array(fmts, pa.string()),
                "pix_md5": pa.array(digests, pa.string()),
                "pix_ok": pa.array(oks, pa.bool_()),
            }
        )
