"""Dense optical flow on device (Farnebäck + TV-L1).

Both solvers warp with displacement-bounded kernels: each warp clamps
per-level displacements to ±max_disp px (default 32 — ample for
Crowd-11-scale motion; larger motions saturate rather than wrap).  Pass
max_disp= to farneback_flow_pair / tvl1_flow_pair to raise the bound for
large-motion footage.  Deviation from cv2's unclamped remap is documented
in PARITY.md.
"""

from .farneback import (  # noqa: F401
    REFERENCE_PARAMS,
    farneback_flow_batch,
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
