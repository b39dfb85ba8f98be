from .filters import setup_filter
from .bias_act import bias_act, activation_funcs
from .upfirdn2d import upfirdn2d, filter2d, upsample2d, downsample2d
from .conv2d_resample import conv2d_resample
from .modulated_conv import modulated_conv2d
from .grid_sample import grid_sample, affine_grid, translate_sample
from .composite import alpha_composite, alpha_composite_premultiplied, translate_and_composite
