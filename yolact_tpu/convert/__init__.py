from yolact_tpu.convert.torch_import import (
    convert_state_dict, load_pth, load_reference_weights)
