from .ngp import (
    NGPConfig,
    ngp_init,
    ngp_query_density,
    ngp_forward,
    ngp_features,
    ngp_features_to_rgb,
    ngp_normalize,
)
from .field import FieldConfig, field_init, field_apply, field_with_grad

__all__ = [
    "NGPConfig",
    "ngp_init",
    "ngp_query_density",
    "ngp_forward",
    "ngp_features",
    "ngp_features_to_rgb",
    "ngp_normalize",
    "FieldConfig",
    "field_init",
    "field_apply",
    "field_with_grad",
]
