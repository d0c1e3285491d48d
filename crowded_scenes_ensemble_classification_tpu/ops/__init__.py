from . import affine, augment, crop_flip, geometric, group, intensity, resize, temporal  # noqa: F401
from .augment import crowd11_augment, crowd11_augment_batch, identity_resize_batch  # noqa: F401
from .group import one_of, sequential, some_of, sometimes  # noqa: F401
from .resize import crop_resize, resize_bilinear  # noqa: F401
from .temporal import select_frames  # noqa: F401
