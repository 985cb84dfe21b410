from yolact_tpu.kernels.dcn import deform_conv2d
from yolact_tpu.kernels.mask_assembly import (
    assemble_masks_batched_pallas, assemble_masks_pallas, assemble_masks_xla)
from yolact_tpu.kernels.nms_pallas import nms_iou_max_pallas
from yolact_tpu.kernels.psroi import DeformRoIPooling, deform_psroi_pool
