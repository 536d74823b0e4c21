"""Multimodal columns: opaque binary payloads + actor-pool decode stages.

Images/audio/video are carried as Arrow ``binary`` columns with typed
metadata — the reference's ``media`` dicts (triggers.py:221-225) become
columns.  The decode libraries (PIL/ffmpeg/librosa) are NOT in this
container, so the decode kernel for COMPRESSED formats is a
clearly-marked deterministic stub (``FAKE_DECODE=True``) — the Ray-side
plumbing (schema, batch sizing, actor signature, output layout) is real
and tested.  Swap ``_decode`` for a real decoder on a cluster with the
libs installed.  UNCOMPRESSED formats have fully REAL paths:
stages/imagecodec.py (PPM(P6) + 24-bit BMP, pixel-digest verified),
stages/audiocodec.py (RIFF/WAV PCM16 + vectorized window features) and
stages/videocodec.py (Y4M frame sampling, skip-not-copy) — each with an
oracle-green query over real encoded payloads (image_real_decode_meta,
audio_wav_features, video_frame_samples).

Batch-size note: large binary payloads need SMALL batch_size so
batch × concurrency fits worker heaps; callers pass batch_size
explicitly (e.g. 256 for ~1 MB images).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

FAKE_DECODE = True  # no image/audio libs in this sandbox


class ImageDecodeStage:
    """Actor-pool stage: binary image → (width, height, n_bytes, mode).

    Deterministic stub decode: dimensions derived from payload length.
    Real implementation: PIL.Image.open(io.BytesIO(payload)) in
    ``_decode`` — state (decoder pools, color profiles) belongs in
    ``__init__``.
    """

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id"):
        self.payload_col = payload_col
        self.id_col = id_col

    @staticmethod
    def _decode(payload: bytes) -> tuple[int, int, str]:
        if not FAKE_DECODE:  # pragma: no cover
            raise NotImplementedError("real image decode requires PIL; not in sandbox")
        n = len(payload)
        return (n * 7) % 640 + 16, (n * 13) % 480 + 16, "RGB"

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        n = len(payloads)
        w = np.empty(n, dtype=np.int64)
        h = np.empty(n, dtype=np.int64)
        nb = np.empty(n, dtype=np.int64)
        for i, p in enumerate(payloads):
            p = p or b""
            w[i], h[i], _ = self._decode(p)
            nb[i] = len(p)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "width": pa.array(w),
                "height": pa.array(h),
                "n_bytes": pa.array(nb),
            }
        )


class ImageResizeStage:
    """Actor-pool stage: binary image → resized binary payload + dims.

    Deterministic stub "resize": the output payload is the UTF-8 bytes of
    the first ``(target_w * target_h) // 16`` *codepoints* of the decoded
    payload (codepoint windows keep the kernel SQL-expressible, the same
    discipline as the chunk splitter).  Real implementation: PIL
    ``Image.resize`` in ``_resize``; resampling filters / thumbnail caches
    belong in ``__init__``.  Output carries the RESIZED BINARY COLUMN
    itself (payload plumbing is real) plus byte-identity metadata
    (``resized_md5``) so oracles can pin the transform byte-for-byte.
    """

    def __init__(
        self,
        payload_col: str = "payload",
        id_col: str = "doc_id",
        target_w: int = 64,
        target_h: int = 64,
    ):
        self.payload_col = payload_col
        self.id_col = id_col
        self.target_w = target_w
        self.target_h = target_h
        self.k = max(1, (target_w * target_h) // 16)

    def _resize(self, payload: bytes) -> bytes:
        if not FAKE_DECODE:  # pragma: no cover
            raise NotImplementedError("real image resize requires PIL; not in sandbox")
        return payload.decode("utf-8", errors="replace")[: self.k].encode("utf-8")

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        payloads = batch[self.payload_col].to_pylist()
        n = len(payloads)
        resized = [self._resize(p or b"") for p in payloads]
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "resized": pa.array(resized, pa.binary()),
                "out_w": pa.array(np.full(n, self.target_w, dtype=np.int64)),
                "out_h": pa.array(np.full(n, self.target_h, dtype=np.int64)),
                "n_bytes_in": pa.array([len(p or b"") for p in payloads], pa.int64()),
                "n_bytes_out": pa.array([len(r) for r in resized], pa.int64()),
                "resized_md5": pa.array(
                    [hashlib.md5(r).hexdigest() for r in resized], pa.string()
                ),
            }
        )


class AudioFeatureStage:
    """Actor-pool stage: binary "audio" → k fixed windows of features.

    Deterministic stub features: the payload is decoded as UTF-8 and cut
    into ``n_windows`` equal codepoint windows (window i covers
    ``[i*n//k, (i+1)*n//k)``); the feature is the first 8 hex digits of
    the window's md5, scaled to [0, 1).  Real implementation: frame the
    PCM samples and compute MFCC/RMS per frame (librosa) — the model /
    filterbank state belongs in ``__init__``.  Output: one row per
    (id, window_idx, feature) — flat layout so downstream groupbys and
    oracles see plain columns.
    """

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id", n_windows: int = 4):
        self.payload_col = payload_col
        self.id_col = id_col
        self.n_windows = n_windows

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        ids = batch[self.id_col].to_pylist()
        payloads = batch[self.payload_col].to_pylist()
        k = self.n_windows
        out_id, out_idx, out_feat = [], [], []
        for i, p in zip(ids, payloads):
            t = (p or b"").decode("utf-8", errors="replace")
            n = len(t)
            for j in range(k):
                s, e = j * n // k, (j + 1) * n // k
                if e <= s:
                    continue
                h = hashlib.md5(t[s:e].encode("utf-8")).hexdigest()[:8]
                out_id.append(i)
                out_idx.append(j)
                out_feat.append(round(int(h, 16) / 4294967296.0, 6))
        return pa.table(
            {
                self.id_col: pa.array(out_id, pa.int64()),
                "window_idx": pa.array(out_idx, pa.int64()),
                "feature": pa.array(out_feat, pa.float64()),
            }
        )


class FrameSampleStage:
    """Actor-pool stage: binary "video" → k evenly-spaced frame offsets.

    Stub: frame count derived from payload length; real impl would use
    ffmpeg.  Output: one row per sampled frame (id, frame_idx, offset).
    """

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id", k: int = 4):
        self.payload_col = payload_col
        self.id_col = id_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        payloads = batch[self.payload_col].to_pylist()
        out_id, out_idx, out_off = [], [], []
        for i, p in zip(ids, payloads):
            n_frames = max(1, len(p or b"") // 64)
            for j in range(min(self.k, n_frames)):
                out_id.append(i)
                out_idx.append(j)
                out_off.append(j * max(1, n_frames // self.k))
        return pa.table(
            {
                self.id_col: pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_idx, pa.int64()),
                "frame_offset": pa.array(out_off, pa.int64()),
            }
        )
