from yolact_tpu.kernels.dcn import deform_conv2d
