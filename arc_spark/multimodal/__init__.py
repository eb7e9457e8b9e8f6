from arc_spark.multimodal.blobs import (  # noqa: F401
    BLOB_SCHEMA,
    blob_table,
    extract_features,
    sample_frames,
    resize_images,
)
