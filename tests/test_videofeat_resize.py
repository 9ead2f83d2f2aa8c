"""Video temporal features + exact resize tests
(operators/videofeat.py, operators/resize.py)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from economic_data_etl_spark.operators.resize import (
    box_edges,
    box_resize_exact,
)
from economic_data_etl_spark.operators.videofeat import (
    frame_mads,
    scene_cuts,
    shot_lengths,
)


class TestSceneCuts:
    def test_static_shots_through_mjpeg(self):
        from economic_data_etl_spark.operators.codecs import (
            decode_mjpeg_avi,
            encode_mjpeg_avi,
        )
        from economic_data_etl_spark.operators.jpeg import (
            block_constant_pattern,
        )

        frames = []
        for s in range(3):
            shot = block_constant_pattern(11 + 101 * s, 24, 18)
            frames.extend([shot] * 2)
        decoded = decode_mjpeg_avi(encode_mjpeg_avi(frames))
        assert scene_cuts(decoded, threshold=16.0) == [2, 4]
        mads = frame_mads(decoded)
        assert mads[0] == 0.0 and mads[2] == 0.0  # within-shot: exact 0

    def test_edge_cases(self):
        one = [np.zeros((8, 8), np.uint8)]
        assert scene_cuts(one) == []
        assert frame_mads(one).shape == (0,)
        assert shot_lengths(6, [2, 4]) == [2, 2, 2]
        assert shot_lengths(5, []) == [5]

    def test_threshold_boundary(self):
        a = np.zeros((4, 4), np.uint8)
        b = np.full((4, 4), 16, np.uint8)  # MAD exactly 16: no cut
        c = np.full((4, 4), 33, np.uint8)  # MAD 17 from b: cut
        assert scene_cuts([a, b, c], threshold=16.0) == [2]


class TestBoxResize:
    def test_divisible_exact_means(self):
        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        out = box_resize_exact(img, 4, 4)
        # 2x2 boxes: floor of exact means
        want = np.array(
            [
                [(img[2 * i : 2 * i + 2, 2 * j : 2 * j + 2].sum()) // 4
                 for j in range(4)]
                for i in range(4)
            ]
        )
        assert np.array_equal(out, want.astype(np.uint8))

    @given(
        st.integers(16, 50), st.integers(16, 50),
        st.integers(1, 16), st.integers(1, 16),
        st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_matches_naive_box_means(self, h, w, oh, ow, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w)).astype(np.uint8)
        out = box_resize_exact(img, oh, ow)
        ys, xs = box_edges(h, oh), box_edges(w, ow)
        for i in range(oh):
            for j in range(ow):
                box = img[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].astype(
                    np.int64
                )
                assert out[i, j] == box.sum() // box.size

    def test_color_and_identity(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (20, 30, 3)).astype(np.uint8)
        out = box_resize_exact(img, 10, 10)
        assert out.shape == (10, 10, 3)
        same = box_resize_exact(img, 20, 30)
        assert np.array_equal(same, img)  # 1x1 boxes: identity

    def test_upsample_replicates(self):
        img = np.array([[1, 2], [3, 4]], np.uint8)
        up = box_resize_exact(img, 4, 4)
        assert np.array_equal(
            up,
            np.array(
                [[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]],
                np.uint8,
            ),
        )

    def test_rejects_bad_dims(self):
        with pytest.raises(ValueError):
            box_resize_exact(np.zeros((4, 4), np.uint8), 0, 4)
        with pytest.raises(ValueError):
            box_resize_exact(np.zeros((0, 4), np.uint8), 2, 2)
