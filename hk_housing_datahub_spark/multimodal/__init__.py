from .binary import attach_payload, decode_payload_meta  # noqa: F401
