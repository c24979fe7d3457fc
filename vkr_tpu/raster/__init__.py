from vkr_tpu.raster.setup import (
    transform_vertices,
    transform_normals,
    clip_near_triangles,
    triangle_setup,
    bin_triangles,
    TriangleSetup,
)
from vkr_tpu.raster.kernel import (
    rasterize_tiles,
    rasterize_reference,
)
from vkr_tpu.raster.resolve import (
    corner_attributes,
    pixel_barycentrics,
    interpolate,
    interpolate_many,
)
from vkr_tpu.raster.pipeline import rasterize, VisibilityBuffer
