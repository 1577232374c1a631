"""TPU kernels (Pallas) and native host ops."""

from dexnerf_tpu.ops.fused_mlp import (
    flatten_flex_params,
    make_fused_flexible_field,
)
from dexnerf_tpu.ops.fused_mlp_train import make_fused_flexible_field_train
from dexnerf_tpu.ops.fused_render import (
    make_fused_render,
    make_fused_render_rays,
)
from dexnerf_tpu.ops.fused_train_loss import (
    make_fused_pass_loss,
    make_fused_train_loss,
)
from dexnerf_tpu.ops.sample_pdf_pallas import (
    sample_pdf_branchless,
    sample_pdf_pallas,
)

__all__ = [
    "flatten_flex_params",
    "make_fused_flexible_field",
    "make_fused_flexible_field_train",
    "make_fused_pass_loss",
    "make_fused_render",
    "make_fused_render_rays",
    "make_fused_train_loss",
    "sample_pdf_branchless",
    "sample_pdf_pallas",
]
