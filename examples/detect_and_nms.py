"""Detection pipeline example: RetinaFPN dense heads + static-shape NMS,
all jitted end to end."""

import jax
import numpy as np

import smelter_tpu as st
from smelter_tpu.models import retina_fpn
from smelter_tpu.ops.detection import nms


def main():
    g, _tm, shape = retina_fpn.build(batch=1, image_size=256, num_classes=5,
                                     width=16)
    model = st.compile(g, st.Config(compute_dtype="bfloat16"), quant="int8")
    img = np.random.default_rng(0).standard_normal(shape).astype(np.float32)
    cls3, box3, *_ = model(img)

    # decode the finest level's dense predictions into boxes (toy decode:
    # raw deltas as corner offsets on a uniform grid), then NMS.
    n, ac, h, w = box3.shape
    anchors = ac // 4
    grid_y, grid_x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    centers = np.stack([grid_y, grid_x], -1).reshape(-1, 2).astype(np.float32)
    deltas = box3[0].reshape(anchors, 4, h, w).transpose(0, 2, 3, 1).reshape(-1, 4)
    centers = np.tile(centers, (anchors, 1))
    boxes = np.concatenate([centers - np.abs(deltas[:, :2]),
                            centers + np.abs(deltas[:, 2:])], 1)
    scores = cls3[0].reshape(anchors, -1, h, w).max(axis=1).reshape(-1)

    idx, sc = nms(boxes.astype(np.float32), scores.astype(np.float32),
                  max_detections=10, iou_threshold=0.5)
    kept = [int(i) for i in np.asarray(idx) if i >= 0]
    print(f"kept {len(kept)} boxes after NMS; top score "
          f"{float(np.asarray(sc)[0]):.3f}")


if __name__ == "__main__":
    main()
