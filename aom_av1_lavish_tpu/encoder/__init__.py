from .encoder import (encode_lossless_ivf, LosslessEncoder,  # noqa: F401
                      make_sequence_header, make_lossless_frame_header)
