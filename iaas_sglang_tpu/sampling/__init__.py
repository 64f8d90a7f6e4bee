from iaas_sglang_tpu.sampling.sampling_params import SamplingParams

__all__ = ["SamplingParams"]
