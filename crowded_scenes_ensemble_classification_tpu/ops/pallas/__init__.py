from .noise import crowd11_noise_pallas, salt_pepper_pallas  # noqa: F401
