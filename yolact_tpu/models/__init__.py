from yolact_tpu.models.yolact import Yolact, make_model
