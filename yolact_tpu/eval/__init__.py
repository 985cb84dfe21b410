from yolact_tpu.eval.evaluator import (
    APDataObject, badhash, calc_map, prep_metrics, make_ap_data, print_maps,
    IOU_THRESHOLDS)
from yolact_tpu.eval.coco_json import DetectionsWriter
