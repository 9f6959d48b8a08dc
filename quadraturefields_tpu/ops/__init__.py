from .activations import (
    trunc_exp,
    contract_to_unisphere,
    inverse_contraction,
)
from .scan import (
    mark_pack_boundaries,
    exclusive_sum,
    exclusive_prod,
    render_transmittance_from_alpha,
    render_transmittance_from_density,
    render_weight_from_alpha,
    render_weight_from_density,
    render_visibility_from_density,
    accumulate_along_rays,
    derive_properties,
)
from .hashgrid import HashGridConfig, hashgrid_init, hashgrid_encode
from .mlp import mlp_init, mlp_apply
from .sh import spherical_harmonics_deg4

__all__ = [
    "trunc_exp",
    "contract_to_unisphere",
    "inverse_contraction",
    "mark_pack_boundaries",
    "exclusive_sum",
    "exclusive_prod",
    "render_transmittance_from_alpha",
    "render_transmittance_from_density",
    "render_weight_from_alpha",
    "render_weight_from_density",
    "render_visibility_from_density",
    "accumulate_along_rays",
    "derive_properties",
    "HashGridConfig",
    "hashgrid_init",
    "hashgrid_encode",
    "mlp_init",
    "mlp_apply",
    "spherical_harmonics_deg4",
]
