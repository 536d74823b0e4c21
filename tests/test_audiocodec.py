"""WAV codec (stages/audiocodec): RIFF round-trip, chunk-walk
robustness (unknown chunks, word alignment, multi-channel), format
errors, and the vectorized window features vs a serial reference."""

import struct

import numpy as np
import pandas as pd
import pytest


def _sig(n=1000, seed=5):
    rng = np.random.default_rng(seed)
    return rng.integers(-30000, 30000, size=n).astype(np.int16)


class TestWav:
    def test_round_trip(self):
        from deepcrawl4ai_ray.stages.audiocodec import decode_wav_pcm16, encode_wav_pcm16

        s = _sig()
        got, rate = decode_wav_pcm16(encode_wav_pcm16(s, 22050))
        np.testing.assert_array_equal(got, s)
        assert rate == 22050

    def test_unknown_chunks_skipped_and_word_alignment(self):
        from deepcrawl4ai_ray.stages.audiocodec import decode_wav_pcm16, encode_wav_pcm16

        s = _sig(64)
        raw = encode_wav_pcm16(s)
        # splice an ODD-sized LIST chunk (forces the +pad-byte walk)
        # between fmt and data
        fmt_end = raw.index(b"data")
        junk = b"LIST" + struct.pack("<I", 5) + b"abcde" + b"\x00"  # pad byte
        hacked = raw[:fmt_end] + junk + raw[fmt_end:]
        hacked = hacked[:4] + struct.pack("<I", len(hacked) - 8) + hacked[8:]
        got, _ = decode_wav_pcm16(hacked)
        np.testing.assert_array_equal(got, s)

    def test_stereo_downmix_channel0(self):
        from deepcrawl4ai_ray.stages.audiocodec import decode_wav_pcm16

        left = _sig(32, seed=1)
        right = _sig(32, seed=2)
        inter = np.empty(64, dtype=np.int16)
        inter[0::2] = left
        inter[1::2] = right
        data = inter.tobytes()
        fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 4, 4, 16)
        body = (
            b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        raw = b"RIFF" + struct.pack("<I", len(body)) + body
        got, rate = decode_wav_pcm16(raw)
        np.testing.assert_array_equal(got, left)
        assert rate == 8000

    def test_errors(self):
        from deepcrawl4ai_ray.stages.audiocodec import (
            AudioFormatError,
            decode_wav_pcm16,
            encode_wav_pcm16,
        )

        with pytest.raises(AudioFormatError, match="not a RIFF"):
            decode_wav_pcm16(b"OggS junk")
        raw = bytearray(encode_wav_pcm16(_sig(16)))
        struct.pack_into("<H", raw, raw.index(b"fmt ") + 8, 3)  # float fmt
        with pytest.raises(AudioFormatError, match="only PCM16"):
            decode_wav_pcm16(bytes(raw))


class TestFeatures:
    def test_vectorized_matches_serial(self):
        from deepcrawl4ai_ray.stages.audiocodec import window_features

        s = _sig(997, seed=11)
        k = 5
        f = window_features(s, k)
        n = len(s)
        for j in range(k):
            lo, hi = j * n // k, (j + 1) * n // k
            win = s[lo:hi].astype(int)
            assert f["sumsq"][j] == sum(int(x) * int(x) for x in win)
            assert f["count"][j] == hi - lo
            zc = sum(
                1
                for a, b in zip(win, win[1:])
                if (a > 0 and b < 0) or (a < 0 and b > 0)
            )
            assert f["zero_cross"][j] == zc

    def test_stage_flags_undecodable(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.audiocodec import WavFeatureStage, encode_wav_pcm16

        df = pd.DataFrame(
            {"doc_id": [0, 1], "payload": [encode_wav_pcm16(_sig(40)), b"garbage"]}
        )
        out = (
            rd.from_pandas(df)
            .map_batches(WavFeatureStage, batch_format="pyarrow", concurrency=1)
            .to_pandas()
            .sort_values(["doc_id", "window_idx"])
        )
        assert (out[out.doc_id == 0]["window_idx"].tolist()) == [0, 1, 2, 3]
        assert out[out.doc_id == 1]["window_idx"].tolist() == [-1]


class TestReviewFixes:
    def test_truncated_fmt_chunk_flags_not_crashes(self, ray_session):
        """fmt chunk declaring 16 bytes but truncated: the stage must
        emit the window_idx=-1 flag row, never raise struct.error."""
        import ray.data as rd

        from deepcrawl4ai_ray.stages.audiocodec import (
            AudioFormatError,
            WavFeatureStage,
            decode_wav_pcm16,
        )

        bad = b"RIFF" + struct.pack("<I", 20) + b"WAVE" + b"fmt " + struct.pack("<I", 16) + b"\x01\x00"
        with pytest.raises(AudioFormatError):
            decode_wav_pcm16(bad)
        df = pd.DataFrame({"doc_id": [0], "payload": [bad]})
        out = (
            rd.from_pandas(df)
            .map_batches(WavFeatureStage, batch_format="pyarrow", concurrency=1)
            .to_pandas()
        )
        assert out["window_idx"].tolist() == [-1]

    def test_odd_data_chunk_raises_audio_error(self):
        from deepcrawl4ai_ray.stages.audiocodec import (
            AudioFormatError,
            decode_wav_pcm16,
            encode_wav_pcm16,
        )

        raw = bytearray(encode_wav_pcm16(_sig(4)))
        # shrink data chunk by one byte (odd length), fix declared size
        di = bytes(raw).index(b"data")
        struct.pack_into("<I", raw, di + 4, 7)
        raw = raw[:-1]
        with pytest.raises(AudioFormatError, match="odd length"):
            decode_wav_pcm16(bytes(raw))
