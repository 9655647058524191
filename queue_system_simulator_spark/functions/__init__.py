from queue_system_simulator_spark.functions.multimodal import (  # noqa: F401
    MEDIA_SCHEMA,
    decode_media,
    extract_features,
    frame_sample,
    resize_media,
    synthesize_media,
)
