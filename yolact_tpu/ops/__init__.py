from yolact_tpu.ops.boxes import (
    point_form, center_size, intersect, jaccard, elemwise_box_iou,
    mask_iou, elemwise_mask_iou, change, encode, decode,
    sanitize_coordinates, crop)
from yolact_tpu.ops.anchors import generate_priors, feature_map_sizes
