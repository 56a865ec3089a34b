from raytpu.parallel.dist import make_mesh, render_frame_sharded, render_sharded

__all__ = ["make_mesh", "render_frame_sharded", "render_sharded"]
