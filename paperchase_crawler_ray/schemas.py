"""Fixed Arrow schemas for every logical table (SURVEY.md §1).

The image_caption sink schema is mandated verbatim by BASELINE.json:15:
(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
 caption:string, phash:int64).
"""

from __future__ import annotations

import pyarrow as pa

IMAGE_CAPTION = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

FRONTIER = pa.schema(
    [
        ("url", pa.string()),
        ("url_canon", pa.string()),
        ("url_hash", pa.int64()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("priority", pa.float64()),
        ("parent_hash", pa.int64()),
        ("seed_id", pa.int32()),
        ("discovered_wave", pa.int32()),
    ]
)

PAGE = pa.schema(
    [
        ("url_hash", pa.int64()),
        ("url_canon", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("status", pa.int32()),
        ("content_type", pa.string()),
        ("body", pa.binary()),
        ("location", pa.string()),
        ("wave", pa.int32()),
    ]
)

LINEAGE = pa.schema(
    [
        ("run_id", pa.string()),
        ("wave", pa.int32()),
        ("stage", pa.string()),
        ("rows_in", pa.int64()),
        ("rows_out", pa.int64()),
        ("bytes", pa.int64()),
    ]
)

WEB_FIXTURE = pa.schema(
    [
        ("url_canon", pa.string()),
        ("status", pa.int32()),
        ("content_type", pa.string()),
        ("body", pa.binary()),
        ("location", pa.string()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
