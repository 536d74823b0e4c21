"""REAL video codec for the multimodal path — a from-scratch Y4M
(YUV4MPEG2) stream parser + frame sampling, the video sibling of
stages/{image,audio}codec.py (compressed video — h264/vp9 — remains the
documented stub in stages/multimodal.py).

Format (public spec, the ffmpeg/mjpegtools interchange format): one
ASCII header line ``YUV4MPEG2 W<w> H<h> F<num>:<den> [I.. A.. C..]\\n``
then per frame ``FRAME[ params]\\n`` followed by the raw planar YUV
payload — 4:2:0 (default, w*h*3/2 bytes) or 4:4:4 (w*h*3).

Frame SAMPLING is the operator (the reference forwards media untouched,
triggers.py:221-225; a training pipeline thumbnails k frames per clip):
pick k evenly-spaced frames without materializing the rest — the parser
SEEKS over unsampled frame payloads, so per-clip work is O(header +
k·frame), not O(clip).
"""

from __future__ import annotations

import hashlib

import numpy as np


class VideoFormatError(ValueError):
    """Malformed Y4M (bad magic, missing geometry, truncated frame)."""


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """(n, h, w) uint8 LUMA frames → Y4M 4:2:0 bytes (chroma planes
    filled with the neutral 128)."""
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    if f.ndim != 3:
        raise ValueError(f"need (n_frames, h, w) luma, got {f.shape}")
    n, h, w = f.shape
    if h % 2 or w % 2:
        raise ValueError("4:2:0 needs even dimensions")
    chroma = np.full((h // 2) * (w // 2), 128, dtype=np.uint8).tobytes()
    out = [b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C420\n" % (w, h, fps[0], fps[1])]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(f[i].tobytes())
        out.append(chroma)
        out.append(chroma)
    return b"".join(out)


def _parse_header(payload: bytes) -> tuple[int, int, int, str, int]:
    """→ (width, height, header_end, colorspace, frame_bytes)."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise VideoFormatError("not a YUV4MPEG2 stream")
    w = h = None
    cs = "C420"
    for tok in payload[:nl].split(b" ")[1:]:
        try:
            if tok[:1] == b"W":
                w = int(tok[1:])
            elif tok[:1] == b"H":
                h = int(tok[1:])
            elif tok[:1] == b"C":
                cs = tok.decode("ascii")
        except (ValueError, UnicodeDecodeError):
            raise VideoFormatError(f"bad Y4M header token {tok[:20]!r}")
    if not w or not h:
        raise VideoFormatError("Y4M header missing W/H geometry")
    if cs.startswith("C420"):
        fb = w * h * 3 // 2
    elif cs.startswith("C444"):
        fb = w * h * 3
    else:
        raise VideoFormatError(f"unsupported colorspace {cs}")
    return w, h, nl + 1, cs, fb


def probe_y4m(payload: bytes) -> tuple[int, int, int]:
    """→ (width, height, n_frames) by WALKING frame markers (payload
    sizes only — frame bytes are never touched)."""
    w, h, pos, _, fb = _parse_header(payload)
    n = len(payload)
    count = 0
    while pos < n:
        nl = payload.find(b"\n", pos)
        if nl < 0 or payload[pos : pos + 5] != b"FRAME":
            raise VideoFormatError(f"bad FRAME marker at offset {pos}")
        if nl + 1 + fb > n:
            raise VideoFormatError(f"truncated frame {count}")
        pos = nl + 1 + fb
        count += 1
    return w, h, count


def sample_frames(payload: bytes, k: int) -> tuple[int, int, list[tuple[int, np.ndarray]]]:
    """→ (width, height, [(frame_idx, (h, w) uint8 luma), ...]) for k
    evenly-spaced frames (idx = j*(n-1)//(k-1), dedup-preserving order;
    all frames when n <= k).  Unsampled frame payloads are SKIPPED by
    size, never copied."""
    w, h, pos, _, fb = _parse_header(payload)
    n_bytes = len(payload)
    # first pass: frame payload offsets (marker walk, O(n_frames))
    offsets = []
    p = pos
    while p < n_bytes:
        nl = payload.find(b"\n", p)
        if nl < 0 or payload[p : p + 5] != b"FRAME":
            raise VideoFormatError(f"bad FRAME marker at offset {p}")
        if nl + 1 + fb > n_bytes:
            raise VideoFormatError(f"truncated frame {len(offsets)}")
        offsets.append(nl + 1)
        p = nl + 1 + fb
    n = len(offsets)
    if n == 0:
        return w, h, []
    if n <= k:
        idxs = list(range(n))
    elif k == 1:
        idxs = [0]
    else:
        idxs = sorted({j * (n - 1) // (k - 1) for j in range(k)})
    out = []
    luma = w * h
    for i in idxs:
        arr = np.frombuffer(payload[offsets[i] : offsets[i] + luma], dtype=np.uint8)
        out.append((i, arr.reshape(h, w)))
    return w, h, out


class Y4mFrameSampleStage:
    """Actor-pool stage over REAL Y4M payloads: binary → one row per
    sampled frame (id, frame_idx, width, height, luma_mean_x100,
    luma_md5) — integer-exact features so the fixture's serial truth is
    a hash oracle.  Undecodable payloads emit frame_idx = -1."""

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id", k: int = 4):
        self.payload_col = payload_col
        self.id_col = id_col
        self.k = k

    def __call__(self, batch):
        import pyarrow as pa

        ids = batch[self.id_col].to_pylist()
        payloads = batch[self.payload_col].to_pylist()
        out = {"id": [], "f": [], "w": [], "h": [], "lm": [], "md5": []}
        for i, p in zip(ids, payloads):
            try:
                w, h, frames = sample_frames(p, self.k)
            except VideoFormatError:
                out["id"].append(i)
                out["f"].append(-1)
                out["w"].append(0)
                out["h"].append(0)
                out["lm"].append(0)
                out["md5"].append("")
                continue
            for idx, luma in frames:
                out["id"].append(i)
                out["f"].append(idx)
                out["w"].append(w)
                out["h"].append(h)
                # integer-exact scaled mean: sum*100 // count
                out["lm"].append(int(luma.sum(dtype=np.int64)) * 100 // luma.size)
                out["md5"].append(hashlib.md5(luma.tobytes()).hexdigest())
        return pa.table(
            {
                self.id_col: pa.array(out["id"], pa.int64()),
                "frame_idx": pa.array(out["f"], pa.int64()),
                "width": pa.array(out["w"], pa.int64()),
                "height": pa.array(out["h"], pa.int64()),
                "luma_mean_x100": pa.array(out["lm"], pa.int64()),
                "luma_md5": pa.array(out["md5"], pa.string()),
            }
        )
