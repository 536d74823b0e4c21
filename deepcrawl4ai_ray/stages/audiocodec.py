"""REAL audio codec for the multimodal path — a from-scratch WAV
(RIFF/WAVE, PCM16) parser + vectorized windowed features, the audio
sibling of stages/imagecodec.py (compressed audio — mp3/ogg — remains
the documented stub in stages/multimodal.py).

Format (public RIFF spec): ``RIFF <size> WAVE`` then chunks; the
``fmt `` chunk carries (audio_format=1 for PCM, channels, sample_rate,
byte_rate, block_align, bits_per_sample); the ``data`` chunk carries
little-endian interleaved samples.  Unknown chunks (LIST, fact, cue)
are skipped by their declared size — real-world WAV files carry them.

Features are classic frame-level DSP, all numpy-vectorized over the
whole sample array at once (no per-window Python loops): RMS energy
and zero-crossing counts per fixed window — integer/on-grid math where
possible so a SQL oracle over the fixture's stored truth reproduces
them exactly.
"""

from __future__ import annotations

import struct

import numpy as np


class AudioFormatError(ValueError):
    """Malformed WAV payload (bad magic, missing fmt/data, truncation)."""


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """mono int16 samples → canonical PCM16 WAV bytes."""
    s = np.ascontiguousarray(samples, dtype=np.int16)
    if s.ndim != 1:
        raise ValueError(f"need mono 1-D int16 samples, got shape {s.shape}")
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM16 WAV → (mono int16 samples, sample_rate).  Multi-channel
    input is downmixed by taking channel 0 (deterministic).  Skips
    unknown chunks; raises AudioFormatError on non-PCM or truncation."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise AudioFormatError("not a RIFF/WAVE payload")
    pos = 12
    n = len(payload)
    fmt_info = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            if csize < 16 or len(body) < 16:
                raise AudioFormatError(
                    f"fmt chunk too small/truncated (declared {csize}, got {len(body)})"
                )
            fmt_info = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            if len(body) != csize:
                raise AudioFormatError(
                    f"truncated data chunk: want {csize}, got {len(body)}"
                )
            data = body
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt_info is None or data is None:
        raise AudioFormatError("missing fmt or data chunk")
    audio_fmt, channels, rate, _byte_rate, _block, bits = fmt_info
    if audio_fmt != 1 or bits != 16:
        raise AudioFormatError(f"only PCM16 supported (fmt={audio_fmt}, bits={bits})")
    if len(data) % 2:  # odd byte count cannot be int16 samples
        raise AudioFormatError(f"data chunk has odd length {len(data)}")
    samples = np.frombuffer(data, dtype="<i2")
    if channels > 1:
        samples = samples[::channels]  # channel 0
    return samples, rate


def window_features(samples: np.ndarray, n_windows: int) -> dict:
    """Vectorized per-window features over ``n_windows`` equal windows
    (window j covers samples [j*n//k, (j+1)*n//k)):

    * ``rms2``  — MEAN SQUARED amplitude as an integer-exact rational:
      (sum of squares, count) so the oracle needs no float sqrt
    * ``zero_cross`` — count of strict sign changes inside the window
    """
    s = samples.astype(np.int64)
    k = n_windows
    n = len(s)
    bounds = (np.arange(k + 1) * n) // k
    sq = np.concatenate([[0], np.cumsum(s * s)])
    sumsq = sq[bounds[1:]] - sq[bounds[:-1]]
    counts = bounds[1:] - bounds[:-1]
    sign = np.sign(s)
    # strict sign change between consecutive samples (zeros break runs)
    flips = np.concatenate(
        [[0], np.cumsum((sign[1:] * sign[:-1]) < 0)]
    ) if n > 1 else np.zeros(1, dtype=np.int64)
    # zero-crossings counted within a window: pairs (i-1, i) with both in it
    zc = np.empty(k, dtype=np.int64)
    for j in range(k):
        lo, hi = bounds[j], bounds[j + 1]
        zc[j] = flips[max(hi - 1, 0)] - flips[lo] if hi - lo >= 2 else 0
    return {"sumsq": sumsq, "count": counts, "zero_cross": zc}


class WavFeatureStage:
    """Actor-pool stage over REAL WAV payloads: binary → one row per
    (id, window_idx) with integer-exact features (sumsq, n_samples,
    zero_cross) + sample_rate.  Undecodable payloads emit a single row
    with window_idx = -1 (flagged, never silent)."""

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id", n_windows: int = 4):
        self.payload_col = payload_col
        self.id_col = id_col
        self.n_windows = n_windows

    def __call__(self, batch):
        import pyarrow as pa

        ids = batch[self.id_col].to_pylist()
        payloads = batch[self.payload_col].to_pylist()
        out = {"id": [], "w": [], "sumsq": [], "cnt": [], "zc": [], "rate": []}
        for i, p in zip(ids, payloads):
            try:
                samples, rate = decode_wav_pcm16(p)
            except (AudioFormatError, struct.error, ValueError):
                # belt and braces: ANY malformed payload flags, never
                # kills the task (the class docstring's contract)
                out["id"].append(i)
                out["w"].append(-1)
                out["sumsq"].append(0)
                out["cnt"].append(0)
                out["zc"].append(0)
                out["rate"].append(0)
                continue
            f = window_features(samples, self.n_windows)
            for j in range(self.n_windows):
                out["id"].append(i)
                out["w"].append(j)
                out["sumsq"].append(int(f["sumsq"][j]))
                out["cnt"].append(int(f["count"][j]))
                out["zc"].append(int(f["zero_cross"][j]))
                out["rate"].append(rate)
        return pa.table(
            {
                self.id_col: pa.array(out["id"], pa.int64()),
                "window_idx": pa.array(out["w"], pa.int64()),
                "sumsq": pa.array(out["sumsq"], pa.int64()),
                "n_samples": pa.array(out["cnt"], pa.int64()),
                "zero_cross": pa.array(out["zc"], pa.int64()),
                "sample_rate": pa.array(out["rate"], pa.int64()),
            }
        )
