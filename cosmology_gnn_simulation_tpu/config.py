"""Training CLI configuration — flag parity with the reference
(``/root/reference/config.py:6-57``), plus TPU-specific knobs.

Differences from the reference (deliberate):
* no ``--device`` flag (JAX selects the TPU/CPU backend);
* ``--num_workers`` accepted for CLI compatibility but unused (graph
  construction runs on device inside jit, there is no host worker pool);
* added ``--compute_dtype`` (bfloat16 matmuls), ``--aggregate``
  (sender_latents = reference quirk semantics / edge_messages = canonical
  GNS), and ``--data_parallel`` (shard the batch over the device mesh).
"""

from __future__ import annotations

import argparse
import json
import os


def build_train_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Cosmology GNN Simulation (TPU)")

    parser.add_argument("--train_dir", type=str, required=True,
                        help="Directory containing training HDF5 files")
    parser.add_argument("--val_dir", type=str, required=True,
                        help="Directory containing validation HDF5 files")
    parser.add_argument("--metadata_path", type=str, required=True,
                        help="Path to metadata file")
    parser.add_argument("--output_dir", type=str, default="model_output",
                        help="Path to output directory")

    parser.add_argument("--num_neighbors", type=int, default=16,
                        help="Number of nearest neighbors (incl. self)")
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--window_size", type=int, default=5)
    parser.add_argument("--latent_size", type=int, default=128)
    parser.add_argument("--mlp_hidden_size", type=int, default=128)
    parser.add_argument("--mlp_num_hidden_layers", type=int, default=2)
    parser.add_argument("--num_message_passing_steps", type=int, default=10)
    parser.add_argument("--output_size", type=int, default=3)
    parser.add_argument("--noise_std", type=float, default=0.0)
    parser.add_argument("--num_epochs", type=int, default=10)
    parser.add_argument("--learning_rate", type=float, default=1e-4)
    parser.add_argument("--final_learning_rate", type=float, default=1e-4)
    parser.add_argument("--weight_decay", type=float, default=0.0)
    parser.add_argument("--num_workers", type=int, default=0,
                        help="Accepted for reference-CLI compatibility; unused")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--save_every", type=int, default=10)
    parser.add_argument("--augment_prob", type=float, default=1.0)
    parser.add_argument("--temp_rate_loss_weight", type=float, default=1.0)
    parser.add_argument("--acc_loss_weight", type=float, default=1.0)
    parser.add_argument("--momentum_loss_weight", type=float, default=0.0)
    parser.add_argument("--plots_dir", type=str, default="plots")
    parser.add_argument("--pretrained_model", type=str, default=None)
    parser.add_argument("--test_data_path", type=str, default=None)

    # TPU-native additions.
    parser.add_argument("--compute_dtype", type=str, default=None,
                        choices=[None, "bfloat16", "float32"],
                        help="Matmul operand dtype (accumulation stays fp32)")
    parser.add_argument("--aggregate", type=str, default="sender_latents",
                        choices=["sender_latents", "edge_messages"])
    parser.add_argument("--distributed", action="store_true",
                        help="initialize the multi-process (multi-host) JAX "
                             "runtime before building the mesh "
                             "(jax.distributed; coordinator from the "
                             "cluster environment)")
    parser.add_argument("--data_parallel", action="store_true",
                        help="Shard the batch across all visible devices")
    parser.add_argument("--spatial_shards", type=int, default=0,
                        help="Decompose the box into this many x-slabs with "
                             "ppermute halo exchange (particles sharded "
                             "spatially; remaining devices go to the data "
                             "axis). 0/1 = off.")
    parser.add_argument("--neighbor_method", type=str, default="auto",
                        choices=["auto", "bruteforce", "celllist", "pallas"],
                        help="Periodic k-NN backend")
    parser.add_argument("--aggregation", type=str, default="auto",
                        choices=["auto", "gather", "cellblock",
                                 "cellblock_hybrid"],
                        help="Message-passing aggregation backend: 'gather' "
                             "(fused gather+sum, sorted-edge VJP), "
                             "'cellblock' (selection-matrix MXU kernel, "
                             "slot-space carry — the big-N training path) "
                             "or 'cellblock_hybrid' (same kernel, "
                             "particle-space carry)")
    parser.add_argument("--cellblock_variable", action="store_true",
                        help="Variable per-column slot capacities for the "
                             "cellblock aggregation layouts (round 4): "
                             "packs columns at query-block granularity "
                             "behind data-dependent prefix offsets, cutting "
                             "the slot-padding row tax from the Poisson "
                             "tail (~1.3-1.4x) to the QB-rounding floor "
                             "(~1.1x). Identical semantics/certificates; "
                             "cubic-periodic specs only")
    parser.add_argument("--carry_dtype", type=str, default=None,
                        choices=[None, "bfloat16", "float32"],
                        help="Residual-stream carry dtype (bfloat16 halves "
                             "the bandwidth-bound per-step state traffic; "
                             "default float32)")
    parser.add_argument("--remat", action="store_true",
                        help="Rematerialize each message-passing step in "
                             "the backward pass (O(1) residual memory in "
                             "the step count — required for config-4-scale "
                             "training on one chip)")
    parser.add_argument("--remat_chunk", type=int, default=None,
                        help="Hierarchical two-level remat: scan the "
                             "processor as M/chunk checkpointed chunks of "
                             "chunk checkpointed steps (must divide "
                             "num_message_passing_steps); the backward "
                             "holds M/c + c carries instead of M — what "
                             "lets config-4 (N=500k) training fit one chip")
    parser.add_argument("--fused_tail", dest="fused_tail",
                        action="store_const", const=True, default=None,
                        help="Force the fused step-tail Pallas kernel ON in "
                             "the train step (default: auto — on for "
                             "real-TPU bf16 pruned training)")
    parser.add_argument("--no_fused_tail", dest="fused_tail",
                        action="store_const", const=False,
                        help="Force the fused step-tail kernel OFF")
    parser.add_argument("--no_strict_neighbors", action="store_true",
                        help="Downgrade a failed kNN exactness certificate "
                             "from an error to a warning")
    parser.add_argument("--native_loader", action="store_true",
                        help="Use the C++ mmap/prefetch batch loader")
    parser.add_argument("--resume", type=str, default=None,
                        help="Checkpoint dir for FULL resume (params + "
                             "optimizer + epoch + RNG), unlike "
                             "--pretrained_model which loads weights only")
    return parser


def get_config(argv=None):
    args = build_train_parser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    with open(args.metadata_path, "r") as f:
        args.metadata = json.load(f)
    return args
