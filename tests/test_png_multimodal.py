"""Minimal PNG codec (pipelines.png) + multimodal decode stage."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_ray.pipelines.png import (
    PNG_SIGNATURE,
    decode_png,
    encode_png,
    resize_nearest,
    to_gray,
)


def _rand_img(seed, h, w, ch):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


class TestPngRoundtrip:
    @pytest.mark.parametrize("ch", [1, 3, 4])
    @pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
    def test_roundtrip_all_filters(self, ch, ft):
        img = _rand_img(ch * 10 + ft, 13, 17, ch)
        data = encode_png(img, filter_type=ft)
        assert data[:8] == PNG_SIGNATURE
        out = decode_png(data)
        assert np.array_equal(out, img)

    def test_one_pixel(self):
        img = np.array([[123]], np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img)

    @settings(max_examples=30, deadline=None)
    @given(st.integers(0, 10**6), st.integers(1, 12), st.integers(1, 12),
           st.sampled_from([0, 1, 2, 3, 4]))
    def test_roundtrip_property(self, seed, h, w, ft):
        img = _rand_img(seed, h, w, 3)
        assert np.array_equal(decode_png(encode_png(img, filter_type=ft)), img)

    def test_crc_corruption_detected(self):
        data = bytearray(encode_png(_rand_img(1, 8, 8, 3)))
        data[40] ^= 0xFF  # inside IDAT body
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(data))

    def test_not_png_rejected(self):
        with pytest.raises(ValueError, match="signature"):
            decode_png(b"<html>not an image</html>")


class TestKernels:
    def test_resize_nearest_identity(self):
        img = _rand_img(2, 8, 8, 1)
        assert np.array_equal(resize_nearest(img, 8, 8), img)

    def test_resize_downsample_constant(self):
        img = np.full((32, 48), 77, np.uint8)
        out = resize_nearest(img, 8, 8)
        assert out.shape == (8, 8)
        assert (out == 77).all()

    def test_gray_bt601(self):
        img = np.zeros((1, 1, 3), np.uint8)
        img[0, 0] = (100, 200, 50)
        want = (299 * 100 + 587 * 200 + 114 * 50) // 1000
        assert to_gray(img)[0, 0] == want
        g = np.array([[9]], np.uint8)
        assert np.array_equal(to_gray(g), g)


class TestDecodeStage:
    def test_real_decode_and_fallback(self):
        import pyarrow as pa

        from lucene_ray.pipelines.multimodal import DecodeImage

        img = np.full((6, 9, 3), 0, np.uint8)
        img[..., 0] = 200  # red → luma 59
        png = encode_png(img, filter_type=3)
        batch = pa.table(
            {
                "url": ["png", "html"],
                "payload": pa.array([png, b"<html></html>"], pa.binary()),
            }
        )
        out = DecodeImage()(batch)
        assert out.column("real_decode").to_pylist() == [True, False]
        assert out.column("width").to_pylist() == [9, 0]
        assert out.column("height").to_pylist() == [6, 0]
        assert out.column("thumb_mean")[0].as_py() == pytest.approx(
            (299 * 200) // 1000
        )
