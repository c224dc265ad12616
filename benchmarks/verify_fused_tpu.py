"""Small REAL-TPU execution of the fused step-tail kernel vs. the XLA oracle.

Mosaic's window-param/memory passes only run in the remote backend compile
(CLAUDE.md) — jit(...).lower() passing locally proves nothing. This runs the
kernel at small N on the real chip and checks numerics, so a lowering or
precision problem surfaces in seconds instead of failing a 10-minute bench
compile. Run from /root/repo: python benchmarks/verify_fused_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from cosmology_gnn_simulation_tpu.models.mlp import init_mlp
    from cosmology_gnn_simulation_tpu.ops.fused_step import fused_step_tail
    from tests.test_fused_step import _oracle

    print("backend:", jax.default_backend(), flush=True)
    # f32 mode is rejected on real TPU (Mosaic in-kernel f32 matmuls are
    # ~1.5e-3 at HIGHEST — probe-measured round 3, /tmp lore now in
    # CLAUDE.md); the wrapper raises, so only bf16 cases run here.
    for latent, n, dtype, tol in (
        (128, 2048, jnp.bfloat16, 3e-2),
        (128, 2000, jnp.bfloat16, 3e-2),  # rows non-multiple of row_block
        (256, 1024, jnp.bfloat16, 3e-2),
    ):
        params = init_mlp(
            jax.random.PRNGKey(0), 2 * latent, latent, 2, latent,
            layer_norm=True,
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (n, latent))
        agg = jax.random.normal(jax.random.PRNGKey(2), (n, latent))
        got = np.asarray(
            fused_step_tail(x, agg, params, dtype=dtype, interpret=False)
        )
        want = np.asarray(_oracle(x, agg, params, dtype))
        err = np.max(np.abs(got - want) / (np.abs(want) + 1.0))
        status = "OK" if err < tol else "FAIL"
        print(f"latent={latent} n={n} {jnp.dtype(dtype).name}: "
              f"max rel err {err:.2e} [{status}]", flush=True)
        assert err < tol, (latent, n, dtype, err)
    print("FUSED_TAIL_TPU_OK", flush=True)


if __name__ == "__main__":
    main()
