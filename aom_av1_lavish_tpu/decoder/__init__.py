from .decoder import decode_ivf, decode_frame_obus  # noqa: F401
