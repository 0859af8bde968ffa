from fem_tpu.parallel.mesh import make_mesh, make_sharded_map_fn

__all__ = ["make_mesh", "make_sharded_map_fn"]
