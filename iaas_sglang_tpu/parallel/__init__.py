from iaas_sglang_tpu.parallel.mesh import MeshContext, make_mesh

__all__ = ["MeshContext", "make_mesh"]
