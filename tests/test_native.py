"""Native C++ library tests: parity vs numpy for relayout / quantize / fp16."""

import numpy as np
import pytest

from smelter_tpu import native


class TestNative:
    def test_library_loaded(self):
        # The baked-in g++ must produce a working .so in this environment.
        assert native.available()

    def test_relayout_hwio(self, rng):
        w = rng.standard_normal((8, 3, 5, 7)).astype(np.float32)
        got = native.relayout_oihw_to_hwio(w)
        np.testing.assert_array_equal(got, w.transpose(2, 3, 1, 0))

    def test_relayout_ohwi(self, rng):
        w = rng.standard_normal((4, 6, 3, 3)).astype(np.float32)
        got = native.relayout_oihw_to_ohwi(w)
        np.testing.assert_array_equal(got, w.transpose(0, 2, 3, 1))

    def test_relayout_ohwi_flipped(self, rng):
        w = rng.standard_normal((4, 6, 3, 5)).astype(np.float32)
        got = native.relayout_oihw_to_ohwi(w, flip_spatial=True)
        np.testing.assert_array_equal(got, w[:, :, ::-1, ::-1].transpose(0, 2, 3, 1))

    def test_quantize_matches_numpy(self, rng):
        w = rng.standard_normal((64, 1200)).astype(np.float32)
        q, s = native.quantize_per_channel_int8(w)
        amax = np.abs(w).max(axis=1)
        np.testing.assert_allclose(s, amax / 127.0, rtol=1e-6)
        back = q.astype(np.float32) * s[:, None]
        assert np.abs(back - w).max() <= (amax.max() / 127.0) * 0.5 + 1e-6
        # bit-exact vs the numpy fallback formula
        qn = np.clip(np.round(w / (amax / 127.0)[:, None]), -127, 127).astype(np.int8)
        # allow off-by-one on exact .5 ties (nearbyint vs np.round both use
        # banker's rounding — should be identical)
        np.testing.assert_array_equal(q, qn)

    def test_quantize_zero_channel(self):
        w = np.zeros((4, 100), np.float32)
        q, s = native.quantize_per_channel_int8(w)
        np.testing.assert_array_equal(q, 0)
        np.testing.assert_array_equal(s, 1.0)

    def test_fp16_conversion(self, rng):
        a = np.concatenate([
            rng.standard_normal(10000).astype(np.float32) * 100,
            np.array([0.0, -0.0, np.inf, -np.inf, 1e-8, 65504.0, 7e4], np.float32),
        ])
        got = native.convert_f32_to_f16(a)
        with np.errstate(over="ignore"):  # 7e4 overflows fp16 by design
            want = a.astype(np.float16)
        np.testing.assert_array_equal(got.view(np.uint16), want.view(np.uint16))


class TestIngestAndInt4:
    def test_preprocess_images_nchw_nhwc(self, rng):
        from smelter_tpu import native

        u8 = rng.integers(0, 256, (3, 8, 9, 3)).astype(np.uint8)
        mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
        got = native.preprocess_images(u8, mean, std, "NCHW")
        f = u8.astype(np.float32) / 255.0
        want = np.transpose((f - mean) / std, (0, 3, 1, 2)).astype(np.float32)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        got2 = native.preprocess_images(u8, mean, std, "NHWC")
        np.testing.assert_allclose(got2, ((f - mean) / std).astype(np.float32),
                                   rtol=1e-5, atol=1e-5)

    def test_unpack_int4_matches_numpy(self, rng):
        from smelter_tpu import native

        for count in (1, 2, 17, 4096):
            packed = rng.integers(0, 256, ((count + 1) // 2,)).astype(np.uint8)
            for signed in (True, False):
                got = native.unpack_int4(packed, count, signed=signed)
                lo = (packed & 0xF).astype(np.int8)
                hi = (packed >> 4).astype(np.int8)
                want = np.stack([lo, hi], -1).reshape(-1)[:count]
                if signed:
                    want = np.where(want > 7, want - 16, want).astype(np.int8)
                np.testing.assert_array_equal(got, want)
