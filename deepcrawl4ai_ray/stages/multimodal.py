"""Multimodal columns: opaque binary payloads + actor-pool decode stages.

Images/audio/video are carried as Arrow ``binary`` columns with typed
metadata — the reference's ``media`` dicts (triggers.py:221-225) become
columns.  The decode libraries (PIL/ffmpeg/librosa) are NOT in this
container, so the decode kernel is a clearly-marked deterministic stub
(``FAKE_DECODE=True``) — the Ray-side plumbing (schema, batch sizing,
actor signature, output layout) is real and tested.  Swap ``_decode``
for a real decoder on a cluster with the libs installed.

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
