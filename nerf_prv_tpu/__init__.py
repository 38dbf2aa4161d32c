"""nerf_prv_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
Prediction-of-Required-Views (PRV) NeRF view planning.

Re-designed from scratch with the capabilities of the NeRF-PRV research
pipeline (ICRA 2024, "How Many Views Are Needed to Reconstruct an Unknown
Object Using NeRF?"): given an unknown tabletop object and a few initial RGB
views, predict how many hemisphere views a NeRF needs to reach diminishing
returns, plan a shortest path through that many views, capture them, train a
NeRF, and evaluate PSNR/SSIM against ensemble-NBV and statistics baselines.

Where the reference is a 4-process file-IPC pipeline (C++ simulator +
instant-ngp CUDA server + OriginPro fitting + PyTorch PRVNet server), this
framework is one JAX program:

- ``core``      typed config, camera model (Brown-Conrady/F-theta/KB4),
                look-at pose solver, instant-ngp ``transforms.json`` schema
- ``viewspace`` hemisphere view-space generation + loaders
- ``scene``     ground-truth voxel scenes and the batched virtual camera
                (point-splat rasterizer in JAX)
- ``nerf``      multiresolution hash-grid NeRF: train / eval / render
- ``ops``       Pallas TPU kernels for the hot paths
- ``planning``  local line-arc path geometry + open-loop TSP global planner
- ``prvnet``    ConvNeXt-V2 based view-budget regression (Flax)
- ``labeling``  batched lognormal-CDF curve fitting and label extraction
- ``pipeline``  the mode-dispatcher CLI mirroring the reference's 12 modes
- ``parallel``  device-mesh / sharding helpers (dp/ep over ICI)
- ``runtime``   native C++ IO runtime (PLY parsing, voxelization, file IPC)
"""

__version__ = "0.1.0"
