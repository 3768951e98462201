from tip_tpu.nn import initializers
from tip_tpu.nn.gcn import gcn_conv_init, gcn_conv_apply, gcn_conv_apply_windowed
from tip_tpu.nn.rgcn import rgcn_init, rgcn_apply, rgcn_apply_padded
from tip_tpu.nn.hierarchy import hierarchy_conv_init, hierarchy_conv_apply
from tip_tpu.nn.decoders import (
    distmult_init,
    distmult_apply,
    distmult_apply_padded,
    nn_decoder_init,
    nn_decoder_apply,
    nn_decoder_apply_padded,
)
from tip_tpu.nn.encoders import (
    pp_encoder_init,
    pp_encoder_apply,
    fm_encoder_init,
    fm_encoder_apply,
    hier_encoder_init,
    hier_encoder_apply,
)

__all__ = [
    "initializers",
    "gcn_conv_init",
    "gcn_conv_apply",
    "gcn_conv_apply_windowed",
    "rgcn_init",
    "rgcn_apply",
    "rgcn_apply_padded",
    "distmult_apply_padded",
    "nn_decoder_apply_padded",
    "hierarchy_conv_init",
    "hierarchy_conv_apply",
    "distmult_init",
    "distmult_apply",
    "nn_decoder_init",
    "nn_decoder_apply",
    "pp_encoder_init",
    "pp_encoder_apply",
    "fm_encoder_init",
    "fm_encoder_apply",
    "hier_encoder_init",
    "hier_encoder_apply",
]
