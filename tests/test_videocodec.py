"""Y4M codec (stages/videocodec): round-trip probe/sample, even-spacing
sampling rule, skip-not-copy behavior, format errors."""

import numpy as np
import pandas as pd
import pytest


def _clip(n=6, h=4, w=6, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, h, w)).astype(np.uint8)


class TestY4m:
    def test_probe_and_sample_round_trip(self):
        from deepcrawl4ai_ray.stages.videocodec import encode_y4m, probe_y4m, sample_frames

        f = _clip(7, 4, 6)
        raw = encode_y4m(f)
        assert probe_y4m(raw) == (6, 4, 7)
        w, h, frames = sample_frames(raw, k=7)
        assert (w, h) == (6, 4)
        assert [i for i, _ in frames] == list(range(7))
        for i, luma in frames:
            np.testing.assert_array_equal(luma, f[i])

    def test_even_spacing_includes_first_and_last(self):
        from deepcrawl4ai_ray.stages.videocodec import encode_y4m, sample_frames

        f = _clip(10, 2, 2)
        _, _, frames = sample_frames(encode_y4m(f), k=4)
        assert [i for i, _ in frames] == [0, 3, 6, 9]

    def test_fewer_frames_than_k_returns_all(self):
        from deepcrawl4ai_ray.stages.videocodec import encode_y4m, sample_frames

        f = _clip(2, 2, 2)
        _, _, frames = sample_frames(encode_y4m(f), k=5)
        assert [i for i, _ in frames] == [0, 1]

    def test_frame_params_tolerated(self):
        """Real encoders emit per-frame parameters after FRAME."""
        from deepcrawl4ai_ray.stages.videocodec import encode_y4m, probe_y4m

        f = _clip(3, 2, 2)
        raw = encode_y4m(f).replace(b"FRAME\n", b"FRAME Ip\n", 1)
        assert probe_y4m(raw) == (2, 2, 3)

    def test_errors(self):
        from deepcrawl4ai_ray.stages.videocodec import (
            VideoFormatError,
            encode_y4m,
            probe_y4m,
        )

        with pytest.raises(VideoFormatError, match="not a YUV4MPEG2"):
            probe_y4m(b"RIFF....")
        with pytest.raises(VideoFormatError, match="truncated frame"):
            probe_y4m(encode_y4m(_clip(3, 2, 2))[:-3])
        with pytest.raises(VideoFormatError, match="unsupported colorspace"):
            probe_y4m(b"YUV4MPEG2 W2 H2 F25:1 C422\nFRAME\n" + b"\x00" * 8)

    def test_stage_flags_undecodable(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.videocodec import Y4mFrameSampleStage, encode_y4m

        df = pd.DataFrame(
            {"doc_id": [0, 1], "payload": [encode_y4m(_clip(5, 2, 2)), b"nope"]}
        )
        out = (
            rd.from_pandas(df)
            .map_batches(Y4mFrameSampleStage, batch_format="pyarrow", concurrency=1)
            .to_pandas()
            .sort_values(["doc_id", "frame_idx"])
        )
        assert out[out.doc_id == 0]["frame_idx"].tolist() == [0, 1, 2, 4]
        assert out[out.doc_id == 1]["frame_idx"].tolist() == [-1]


class TestReviewFixes:
    def test_non_numeric_header_token_is_format_error(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.videocodec import (
            VideoFormatError,
            Y4mFrameSampleStage,
            probe_y4m,
        )

        bad = b"YUV4MPEG2 Wabc H16 F25:1\nFRAME\n" + b"\x00" * 8
        with pytest.raises(VideoFormatError, match="bad Y4M header token"):
            probe_y4m(bad)
        # and the stage flags instead of crashing
        df = pd.DataFrame({"doc_id": [0], "payload": [bad]})
        out = (
            rd.from_pandas(df)
            .map_batches(Y4mFrameSampleStage, batch_format="pyarrow", concurrency=1)
            .to_pandas()
        )
        assert out["frame_idx"].tolist() == [-1]
