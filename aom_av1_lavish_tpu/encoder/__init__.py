from .encoder import encode_lossless_ivf, LosslessEncoder  # noqa: F401
