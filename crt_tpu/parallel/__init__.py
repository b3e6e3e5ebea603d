from crt_tpu.parallel.sharded import (
    make_mesh,
    render_image_sharded,
    inverse_render_step,
)

__all__ = ["make_mesh", "render_image_sharded", "inverse_render_step"]
