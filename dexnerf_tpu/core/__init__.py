"""Pure functional core: encodings, rays, sampling, compositing, metrics, Lie ops."""

from dexnerf_tpu.core import lie
from dexnerf_tpu.core.encoding import (
    encoding_dim,
    frequency_bands,
    get_embedding_function,
    positional_encoding,
)
from dexnerf_tpu.core.metrics import (
    ScalarMetric,
    compute_err_metric,
    depth_error_img,
    gen_error_colormap_depth,
    img2mse,
    mse2psnr,
)
from dexnerf_tpu.core.rays import (
    get_ray_bundle,
    get_ray_bundle_c2w,
    get_ray_bundle_w2c,
    meshgrid_xy,
    ndc_rays,
    ndc_t_to_world_depth,
    pixel_grid,
)
from dexnerf_tpu.core.sampling import (
    hierarchical_z_vals,
    perturb_z_vals,
    sample_pdf,
    searchsorted_right,
    stratified_z_vals,
    weights_to_cdf,
)
from dexnerf_tpu.core.volrend import (
    VolumeRenderOutputs,
    cumprod_exclusive,
    ray_dists,
    depth_confidence,
    sigma_threshold_depth,
    sigma_to_weights,
    volume_render_radiance_field,
)

__all__ = [
    "lie",
    "encoding_dim",
    "frequency_bands",
    "get_embedding_function",
    "positional_encoding",
    "ScalarMetric",
    "compute_err_metric",
    "depth_error_img",
    "gen_error_colormap_depth",
    "img2mse",
    "mse2psnr",
    "get_ray_bundle",
    "get_ray_bundle_c2w",
    "get_ray_bundle_w2c",
    "meshgrid_xy",
    "ndc_rays",
    "ndc_t_to_world_depth",
    "pixel_grid",
    "hierarchical_z_vals",
    "perturb_z_vals",
    "sample_pdf",
    "searchsorted_right",
    "stratified_z_vals",
    "weights_to_cdf",
    "VolumeRenderOutputs",
    "cumprod_exclusive",
    "ray_dists",
    "depth_confidence",
    "sigma_threshold_depth",
    "sigma_to_weights",
    "volume_render_radiance_field",
]
