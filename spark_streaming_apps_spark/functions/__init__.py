from .scalar import (  # noqa: F401
    md5_hex, parse_seq_from_name, chunk_path, topic_strip_case,
    extract_error_offset, synth_error_message,
)
from .hashing import portable_hash64, portable_hash64_sql  # noqa: F401
