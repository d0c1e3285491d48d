from .farneback import (  # noqa: F401
    REFERENCE_PARAMS,
    farneback_flow_clip,
    farneback_flow_pair,
    polynomial_expansion,
    rgb_to_gray,
)
from .pyramid import (  # noqa: F401
    build_pyramid,
    image_gradients,
    pyr_down,
    upsample_flow,
    warp_image,
)
from .tvl1 import (  # noqa: F401
    dequantize_flow_u8,
    quantize_flow_u8,
    tvl1_flow_clip,
    tvl1_flow_pair,
)
