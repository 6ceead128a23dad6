"""epcnet_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework with the
capabilities of fpthink/EPC-Net: efficient point-cloud feature learning for
large-scale place recognition.

Reference parity contract (see SURVEY.md §3.4): a 4096-point submap in,
a 256-D L2-normalized global descriptor out, via
spatial-adjacency kNN -> ProxyConv backbone -> G-VLAD aggregation,
plus Oxford-RobotCar-style recall@N retrieval evaluation.

NOTE on citations: the reference mount at /root/reference was EMPTY at build
time (SURVEY.md §0). Where docstrings cite reference files they cite the
*expected* file from the public PointNetVLAD/EPC-Net lineage, marked
[LINEAGE], or the EPC-Net paper (arXiv:2101.02374), marked [PAPER].
"""

from epcnet_tpu.configs import (
    ModelConfig,
    TrainConfig,
    DataConfig,
    MeshConfig,
    EvalConfig,
    ExperimentConfig,
)

__version__ = "0.1.0"

__all__ = [
    "ModelConfig",
    "TrainConfig",
    "DataConfig",
    "MeshConfig",
    "EvalConfig",
    "ExperimentConfig",
    "__version__",
]
