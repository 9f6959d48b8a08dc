from .renderer import (
    RenderConfig,
    render_rays_occgrid,
    render_rays_field,
    render_image_with_occgrid,
)

__all__ = [
    "RenderConfig",
    "render_rays_occgrid",
    "render_rays_field",
    "render_image_with_occgrid",
]
