from goffish_v3_spark.functions.ids import (
    file_vid,
    pack_id,
    unpack_part,
    unpack_local,
    content_sha256,
)

__all__ = ["file_vid", "pack_id", "unpack_part", "unpack_local", "content_sha256"]
