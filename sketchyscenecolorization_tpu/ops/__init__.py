from .conv import conv2d, atrous_conv2d, pad1_conv4, conv2d_transpose, max_pool_3x3_s2
from .norm import (
    frozen_batch_norm, batch_stats_norm, conditional_batch_stats_norm,
    spectral_normalize, l2_normalize,
)
from .lstm import lstm_cell, lstm_scan, masked_lstm_scan
from .image import (
    mean_pool_2x2, nn_upsample_2x, box_downsample, tf1_resize_bilinear,
    resize_bilinear_half_pixel, resize_bilinear_align_corners,
)
from .spatial import generate_spatial_batch
from .activations import lrelu, prelu, miu_relu, atanh_transform
from .pallas_mlstm import masked_pixel_lstm, mlstm_pallas, mlstm_scan
