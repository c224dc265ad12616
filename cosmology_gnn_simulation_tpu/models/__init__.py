from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
    EncodeProcessDecodeConfig,
    init_encode_process_decode,
    apply_encode_process_decode,
    reference_apply_encode_process_decode,
)
from cosmology_gnn_simulation_tpu.models.mlp import init_mlp, apply_mlp

__all__ = [
    "EncodeProcessDecodeConfig",
    "init_encode_process_decode",
    "apply_encode_process_decode",
    "reference_apply_encode_process_decode",
    "init_mlp",
    "apply_mlp",
]
