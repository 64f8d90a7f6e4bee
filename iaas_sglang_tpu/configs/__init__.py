from iaas_sglang_tpu.configs.model_config import ModelConfig

__all__ = ["ModelConfig"]
