from .maxpool import max_pool_3x3x3_same  # noqa: F401
from .noise import crowd11_noise_pallas, salt_pepper_pallas  # noqa: F401
