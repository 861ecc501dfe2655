"""parallel — multi-chip scaling via jax.sharding (SURVEY.md §2.9).

The reference is single-GPU; its concurrency mechanisms map to:
- frames-in-flight  -> async dispatch (renderer/frame_manager.py)
- multi-queue       -> XLA program order
- scale-out (new)   -> SPMD over a device Mesh:
    * 'frame' axis: independent frames per device group (the DP analog)
    * 'rows' axis: horizontal framebuffer bands per device (the SP/CP
      analog — screen-space work sharding over ICI)
"""

from renderer_rs_tpu.parallel.mesh import make_device_mesh  # noqa: F401
from renderer_rs_tpu.parallel.tile_shard import (  # noqa: F401
    render_frame_sharded,
    resolve_msaa,
    stack_scenes,
    unshard_rows,
)
