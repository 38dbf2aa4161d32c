from .api import (
    eval_nerf,
    load_metrics,
    run,
    save_metrics,
    screenshot_nerf,
    train_nerf,
)
from .hashgrid import HashGridConfig, encode, init_table
from .metrics import linear_to_srgb, mse2psnr, psnr, srgb_to_linear, ssim
from .model import NerfConfig, field, init_params
from .rays import RayDataset, load_dataset, ray_aabb, rays_from_pixels
from .render import render_image, render_rays, render_views
from .train import train

__all__ = [
    "eval_nerf",
    "load_metrics",
    "run",
    "save_metrics",
    "screenshot_nerf",
    "train_nerf",
    "HashGridConfig",
    "encode",
    "init_table",
    "linear_to_srgb",
    "mse2psnr",
    "psnr",
    "srgb_to_linear",
    "ssim",
    "NerfConfig",
    "field",
    "init_params",
    "RayDataset",
    "load_dataset",
    "ray_aabb",
    "rays_from_pixels",
    "render_image",
    "render_views",
    "render_rays",
    "train",
]
