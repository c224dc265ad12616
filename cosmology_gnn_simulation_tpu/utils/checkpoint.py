"""Orbax-backed checkpointing.

Improves on the reference's weights-only ``torch.save(state_dict)``
(``/root/reference/train.py:334-336,348-351``): checkpoints carry params,
optimizer state, epoch, PRNG key, and the full model/train configuration —
fixing the reference footgun where model hyperparameters must be manually
re-specified (and matched) at eval time (SURVEY.md §5). The best/periodic/
final cadence is preserved.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(
    directory: str,
    name: str,
    params: Any,
    opt_state: Any = None,
    *,
    epoch: Optional[int] = None,
    rng_key: Optional[jax.Array] = None,
    config: Optional[Dict] = None,
) -> str:
    """Save a checkpoint bundle under ``directory/name``."""
    path = os.path.abspath(os.path.join(directory, name))
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if epoch is not None:
        payload["epoch"] = np.asarray(epoch)
    if rng_key is not None:
        payload["rng_key"] = jax.random.key_data(rng_key)
    # Save host copies: training state is replicated (P()) even under
    # sharded training, and baking device shardings into the checkpoint
    # breaks restore on a different topology (e.g. halo-sharded train ->
    # single-device rollout: orbax then demands a concrete sharding).
    payload = jax.tree.map(np.asarray, payload)
    checkpointer = ocp.PyTreeCheckpointer()
    checkpointer.save(path, payload, force=True)
    if config is not None:
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(config, f, indent=2, default=str)
    return path


def load_checkpoint_with_template(path: str, template: Dict) -> Dict:
    """Structure-exact restore (for resume: optimizer NamedTuples, PRNG key
    arrays). ``template`` must be a dict with the same keys/pytree structure
    as the saved payload, e.g. ``{"params": ..., "opt_state": ...,
    "epoch": np.int64(0), "rng_key": uint32[2]}``."""
    checkpointer = ocp.PyTreeCheckpointer()
    return checkpointer.restore(os.path.abspath(path), item=template)


def _lists_to_tuples(tree: Any) -> Any:
    """Orbax round-trips tuples as lists; our param pytrees use tuples
    (e.g. MLP ``layers``), so normalize the container types back."""
    if isinstance(tree, (list, tuple)):
        return tuple(_lists_to_tuples(x) for x in tree)
    if isinstance(tree, dict):
        return {k: _lists_to_tuples(v) for k, v in tree.items()}
    return tree


def load_checkpoint(path: str, template: Any = None) -> Dict:
    """Load a checkpoint bundle (arrays restore as numpy; JAX converts on
    first use). A bundle may contain any subset of
    ``params / opt_state / epoch / rng_key``. ``template`` is accepted for
    API stability but structure is recovered generically."""
    del template
    checkpointer = ocp.PyTreeCheckpointer()
    restored = dict(checkpointer.restore(os.path.abspath(path)))
    restored = {k: _lists_to_tuples(v) for k, v in restored.items()}
    config_path = os.path.join(path, "config.json")
    if os.path.exists(config_path):
        with open(config_path) as f:
            restored["config"] = json.load(f)
    return restored
