from yolact_tpu.detect.detection import detect, Detections
from yolact_tpu.detect.postprocess import postprocess_device, finish_masks
