"""Static-shape NMS tests vs a numpy reference implementation."""

import numpy as np
import pytest

from smelter_tpu.ops.detection import batched_nms, nms


def ref_nms(boxes, scores, iou_thr, score_thr, max_det):
    def iou(a, b):
        y1, x1 = max(a[0], b[0]), max(a[1], b[1])
        y2, x2 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(y2 - y1, 0) * max(x2 - x1, 0)
        aa = max(a[2] - a[0], 0) * max(a[3] - a[1], 0)
        ab = max(b[2] - b[0], 0) * max(b[3] - b[1], 0)
        return inter / max(aa + ab - inter, 1e-9)

    order = np.argsort(-scores)
    keep = []
    for i in order:
        if scores[i] <= score_thr:
            continue
        if all(iou(boxes[i], boxes[j]) <= iou_thr for j in keep):
            keep.append(i)
        if len(keep) == max_det:
            break
    return keep


class TestNMS:
    def test_matches_reference(self, rng):
        n = 40
        centers = rng.random((n, 2)) * 10
        sizes = rng.random((n, 2)) * 2 + 0.5
        boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                               axis=1).astype(np.float32)
        scores = rng.random(n).astype(np.float32)
        idx, sc = nms(boxes, scores, max_detections=10, iou_threshold=0.5)
        want = ref_nms(boxes, scores, 0.5, 0.0, 10)
        got = [int(i) for i in np.asarray(idx) if i >= 0]
        assert got == want

    def test_padding(self, rng):
        boxes = np.asarray([[0, 0, 1, 1], [5, 5, 6, 6]], np.float32)
        scores = np.asarray([0.9, 0.8], np.float32)
        idx, sc = nms(boxes, scores, max_detections=5)
        assert list(np.asarray(idx)) == [0, 1, -1, -1, -1]
        np.testing.assert_allclose(np.asarray(sc)[2:], 0.0)

    def test_suppression(self):
        # two heavily overlapping boxes: lower score suppressed
        boxes = np.asarray([[0, 0, 2, 2], [0.1, 0.1, 2.1, 2.1],
                            [5, 5, 6, 6]], np.float32)
        scores = np.asarray([0.9, 0.85, 0.5], np.float32)
        idx, _ = nms(boxes, scores, max_detections=3, iou_threshold=0.5)
        assert list(np.asarray(idx)) == [0, 2, -1]

    def test_batched_shapes(self, rng):
        b, c, n = 2, 3, 20
        boxes = rng.random((b, n, 4)).astype(np.float32)
        boxes[..., 2:] += boxes[..., :2]
        scores = rng.random((b, c, n)).astype(np.float32)
        idx, sc = batched_nms(boxes, scores, max_detections=7)
        assert idx.shape == (b, c, 7) and sc.shape == (b, c, 7)


class TestDynamicShapeOpErrors:
    """Data-dependent-shape ops fail with a pointer to the static
    alternative, not a bare unknown-op error."""

    @pytest.mark.parametrize("op,nin", [
        ("NonMaxSuppression", 2), ("NonZero", 1), ("Unique", 1), ("Compress", 2),
    ])
    def test_explained_failure(self, op, nin):
        from smelter_tpu.ir.build import GraphBuilder
        from smelter_tpu.ir.errors import NotSupportedError
        from smelter_tpu.utils import dtypes as dt
        import smelter_tpu as st

        b = GraphBuilder("t", opset=17)
        ins = [b.input(f"x{i}", (4, 4), dt.FLOAT) for i in range(nin)]
        g = b.finish([b.node(op, ins)])
        with pytest.raises(NotSupportedError, match="data-dependent"):
            st.CompiledModel(g)(*[np.zeros((4, 4), np.float32)] * nin)
