"""Pure-numpy image codecs (stages/imagecodec): bit-exact round-trips
for PPM(P6) and 24-bit BMP across padding widths, header edge cases,
corruption detection, nearest-neighbor resize, and the decode stage's
pixel-digest verification."""

import numpy as np
import pandas as pd
import pytest


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)


class TestPpm:
    def test_round_trip(self):
        from deepcrawl4ai_ray.stages.imagecodec import decode_ppm, encode_ppm

        a = _img(13, 17)
        np.testing.assert_array_equal(decode_ppm(encode_ppm(a)), a)

    def test_header_comments_and_whitespace(self):
        from deepcrawl4ai_ray.stages.imagecodec import decode_ppm, encode_ppm

        a = _img(2, 3)
        raw = encode_ppm(a)
        # inject a comment line + extra whitespace into the header
        body = raw[raw.index(b"255\n") + 4 :]
        hacked = b"P6\n# a comment\n 3  2\n# another\n255\n" + body
        np.testing.assert_array_equal(decode_ppm(hacked), a)

    def test_truncated_and_bad_magic_raise(self):
        from deepcrawl4ai_ray.stages.imagecodec import (
            ImageFormatError,
            decode_ppm,
            encode_ppm,
        )

        with pytest.raises(ImageFormatError, match="bad magic"):
            decode_ppm(b"P5\n1 1\n255\nx")
        with pytest.raises(ImageFormatError, match="truncated PPM pixels"):
            decode_ppm(encode_ppm(_img(4, 4))[:-5])


class TestBmp:
    @pytest.mark.parametrize("w", [1, 2, 3, 4, 5, 17])  # all pad classes
    def test_round_trip_padding(self, w):
        from deepcrawl4ai_ray.stages.imagecodec import decode_bmp24, encode_bmp24

        a = _img(5, w, seed=w)
        np.testing.assert_array_equal(decode_bmp24(encode_bmp24(a)), a)

    def test_top_down_height_negative(self):
        from deepcrawl4ai_ray.stages.imagecodec import decode_bmp24, encode_bmp24
        import struct

        a = _img(4, 6, seed=9)
        raw = bytearray(encode_bmp24(a))
        # flip to top-down: negate height AND reorder rows accordingly
        (h,) = struct.unpack_from("<i", raw, 22)
        struct.pack_into("<i", raw, 22, -h)
        stride = (6 * 3 + 3) & ~3
        off = 54
        rows = [bytes(raw[off + i * stride : off + (i + 1) * stride]) for i in range(4)]
        raw[off:] = b"".join(reversed(rows))
        np.testing.assert_array_equal(decode_bmp24(bytes(raw)), a)

    def test_unsupported_bpp_raises(self):
        from deepcrawl4ai_ray.stages.imagecodec import (
            ImageFormatError,
            decode_bmp24,
            encode_bmp24,
        )
        import struct

        raw = bytearray(encode_bmp24(_img(2, 2)))
        struct.pack_into("<H", raw, 28, 32)  # claim 32 bpp
        with pytest.raises(ImageFormatError, match="unsupported BMP"):
            decode_bmp24(bytes(raw))


class TestStage:
    def test_resize_nearest_shape_and_identity(self):
        from deepcrawl4ai_ray.stages.imagecodec import resize_nearest

        a = _img(8, 12)
        np.testing.assert_array_equal(resize_nearest(a, 12, 8), a)
        small = resize_nearest(a, 6, 4)
        assert small.shape == (4, 6, 3)
        # nearest: every output pixel is some input pixel
        assert small[0, 0].tolist() == a[0, 0].tolist()

    def test_decode_stage_digest_flags_corruption(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.imagecodec import (
            RealImageDecodeStage,
            encode_ppm,
            pixel_md5,
        )

        a, b = _img(4, 4, 1), _img(4, 4, 2)
        pa_, pb = encode_ppm(a), encode_ppm(b)
        # corrupt ONE pixel byte of b's payload (header intact)
        pb_bad = pb[:-1] + bytes([pb[-1] ^ 0xFF])
        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "payload": [pa_, pb_bad, b"JUNK"],
                "pix_md5_expected": [pixel_md5(a), pixel_md5(b), ""],
            }
        )
        out = (
            rd.from_pandas(df)
            .map_batches(RealImageDecodeStage, batch_format="pyarrow", concurrency=1)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["pix_ok"].tolist() == [True, False, False]
        assert out["fmt"].tolist() == ["ppm", "ppm", "error"]
