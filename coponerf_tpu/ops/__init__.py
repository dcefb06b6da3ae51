from coponerf_tpu.ops.resize import resize_bilinear, resize_nchw, interpolate4d
from coponerf_tpu.ops.grid_sample import grid_sample, grid_sample_nchw
from coponerf_tpu.ops.correlation import (
    correlation,
    correlation_tokens,
    softmax_with_temperature,
    soft_argmax,
    unnormalise_and_convert_mapping_to_flow,
)
