from lucene_ray.codec.forutil import (  # noqa: F401
    decode_stream,
    decode_stream_blocks,
    encode_stream,
)
