from .c3d import C3D  # noqa: F401
from .common import ConvBN, BNRelu, l2_param_penalty  # noqa: F401
from .i3d import I3D, I3DKinetics, I3DTrunk, INCEPTION_SPECS  # noqa: F401
from .r3d import R3D, R3D_PRESETS, BasicBlock3D, BottleneckBlock3D  # noqa: F401
from .registry import ModelBundle, build_model, predict_proba  # noqa: F401
from .two_stream_i3d import TwoStreamI3D  # noqa: F401
from .pretrained import build_with_condition, load_pretrained_variables  # noqa: F401
