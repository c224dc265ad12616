"""TPU fidelity check: cell-block rollout vs. gather rollout.

Runs the same model/weights through both aggregation paths for a short
rollout at N=16,384 (f32 carry — the paths differ only in summation order)
and reports the max coordinate divergence per step, plus a config-4-sized
cell-block rollout whose in-scan exactness flags must all hold.

Run: cd /root/repo && python benchmarks/verify_cellblock_tpu.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
    init_encode_process_decode,
)
from cosmology_gnn_simulation_tpu.rollout import rollout
from cosmology_gnn_simulation_tpu.training.trainer import default_model_config
from cosmology_gnn_simulation_tpu.types import NormalizationStats


def stats():
    return NormalizationStats(
        temp_mean=jnp.asarray(1.0), temp_std=jnp.asarray(0.3),
        temp_rate_mean=jnp.asarray(0.0), temp_rate_std=jnp.asarray(0.02),
        vel_mean=jnp.asarray(0.0), vel_std=jnp.asarray(0.06),
        acc_mean=jnp.asarray(0.0), acc_std=jnp.asarray(0.2),
        box_size=1.0, dt=0.05,
    )


def window(n, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 1, (1, n, 3))
    drift = rng.normal(0, 2e-4, (5, n, 3)).cumsum(axis=0)
    pos = jnp.asarray(np.remainder(base + drift, 1.0), jnp.float32)
    temp = jnp.asarray(np.abs(rng.normal(1.0, 0.3, (5, n, 1))), jnp.float32)
    return pos, temp


def main():
    st = stats()

    # --- 1. N=16k, 5 steps, f32: gather vs cellblock trajectories.
    n = 16384
    mc = default_model_config(latent_size=128, mlp_hidden_size=128,
                              num_message_passing_steps=10)
    params = init_encode_process_decode(jax.random.PRNGKey(0), mc)
    pos, temp = window(n)
    out_g = rollout(params, mc, pos, temp, st, 5, num_neighbors=16,
                    neighbor_method="pallas")
    out_c = rollout(params, mc, pos, temp, st, 5, num_neighbors=16,
                    neighbor_method="pallas", aggregation="cellblock")
    cg = np.asarray(out_g["Coordinates"])
    cc = np.asarray(out_c["Coordinates"])
    for t in range(5, cg.shape[0]):
        diff = np.abs(cc[t] - cg[t])
        # periodic wrap can turn an epsilon into ~box
        diff = np.minimum(diff, 1.0 - diff)
        print(f"step {t - 5}: max |dx| = {diff.max():.3e}")
    assert bool(np.asarray(out_c["neighbor_exactness"]).all())
    print("N=16k gather-vs-cellblock agreement above (f32, summation-order "
          "level divergence expected to grow ~chaotically)")

    # --- 2. Config-4-sized cellblock rollout: exactness flags must hold.
    n = 500_000
    mc4 = default_model_config(latent_size=256, mlp_hidden_size=256,
                               num_message_passing_steps=15)
    params4 = init_encode_process_decode(jax.random.PRNGKey(1), mc4)
    pos4, temp4 = window(n, seed=1)
    out4 = rollout(params4, mc4, pos4, temp4, st, 3, num_neighbors=32,
                   neighbor_method="pallas", aggregation="cellblock",
                   dtype=jnp.bfloat16)
    flags = np.asarray(out4["neighbor_exactness"])
    finite = np.isfinite(np.asarray(out4["Coordinates"])).all()
    print(f"config-4 cellblock rollout: exactness flags {flags.tolist()}, "
          f"finite={bool(finite)}")
    assert flags.all() and finite
    print("OK")


if __name__ == "__main__":
    main()
