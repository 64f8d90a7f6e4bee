from iaas_sglang_tpu.mem_cache.allocator import PageAllocator
from iaas_sglang_tpu.mem_cache.radix_cache import RadixCache
from iaas_sglang_tpu.mem_cache.chunk_cache import ChunkCache

__all__ = ["PageAllocator", "RadixCache", "ChunkCache"]
