from .binary import (  # noqa: F401
    attach_payload,
    decode_payload_meta,
    extract_payload_features,
    resize_payload,
    sample_frames,
)
