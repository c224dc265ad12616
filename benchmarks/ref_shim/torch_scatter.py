"""torch_scatter shim — imported by `/root/reference/data_utils.py:6` but
never called; scatter_add provided for completeness."""

from __future__ import annotations

import torch


def scatter_add(src, index, dim=0, out=None, dim_size=None):
    if out is None:
        size = list(src.shape)
        size[dim] = dim_size if dim_size is not None else int(index.max()) + 1
        out = torch.zeros(size, dtype=src.dtype, device=src.device)
    return out.index_add_(dim, index, src)
