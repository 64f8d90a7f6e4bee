from iaas_sglang_tpu.multimodal.processor import (  # noqa: F401
    MMItem,
    MultimodalProcessor,
)
