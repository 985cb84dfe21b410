"""TPU-native YOLACT: real-time instance segmentation in JAX/XLA/Pallas.

A ground-up rebuild of the capabilities of dbolya/yolact (YOLACT, ICCV 2019 +
YOLACT++, TPAMI 2020) designed for TPU: static shapes everywhere, fused
fixed-shape detection post-processing, Pallas kernels for deformable
convolution, and `jax.sharding`-based data parallelism.
"""

__version__ = '0.1.0'

from yolact_tpu.config import (  # noqa: F401
    YolactConfig, get_config, get_dataset, config_names,
    config_from_model_path, MEANS, STD, COCO_CLASSES, COCO_LABEL_MAP,
    MaskType)
