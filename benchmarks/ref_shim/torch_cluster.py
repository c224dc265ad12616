"""Exact k-NN with torch_cluster.knn's interface, used at
`/root/reference/data_utils.py:149` over the 27x ghost-extended reference set.

`knn(x, y, k)` -> `[2, len(y)*k]` int64: row 0 = query indices into `y`,
row 1 = the k nearest reference indices into `x` (ascending distance).
Chunked cdist + topk keeps peak memory bounded at large N*27."""

from __future__ import annotations

import torch

# ~queries-per-chunk x references floats; tuned so a chunk's distance matrix
# stays in the low hundreds of MB even at N=65k (27N = 1.77M references).
_CHUNK_ELEMENTS = 64 * 1024 * 1024


@torch.no_grad()
def knn(x: torch.Tensor, y: torch.Tensor, k: int) -> torch.Tensor:
    n_ref = x.size(0)
    if k > n_ref:
        raise ValueError(f"k={k} exceeds reference count {n_ref}")
    chunk = max(1, _CHUNK_ELEMENTS // max(n_ref, 1))
    cols = []
    for start in range(0, y.size(0), chunk):
        q = y[start: start + chunk]
        d = torch.cdist(q, x)
        _, idx = torch.topk(d, k, dim=1, largest=False)
        cols.append(idx.reshape(-1))
    col = torch.cat(cols)
    row = torch.repeat_interleave(
        torch.arange(y.size(0), dtype=torch.long, device=y.device), k
    )
    return torch.stack([row, col], dim=0)
