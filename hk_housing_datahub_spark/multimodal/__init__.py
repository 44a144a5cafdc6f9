from .binary import (  # noqa: F401
    attach_payload,
    decode_payload_meta,
    resize_payload,
    sample_frames,
)
