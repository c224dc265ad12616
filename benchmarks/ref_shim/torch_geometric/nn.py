"""MessagePassing with PyG-default semantics, as the reference relies on:
no `message` override means `message(x_j) = x_j` — the scatter-add aggregates
SENDER NODE FEATURES `x[edge_index[0]]` at receivers `edge_index[1]`
(`/root/reference/graph_network.py:79,92`; SURVEY.md C11)."""

from __future__ import annotations

import torch


class MessagePassing(torch.nn.Module):
    def __init__(self, aggr: str = "add"):
        super().__init__()
        if aggr != "add":
            raise NotImplementedError(f"shim supports aggr='add', got {aggr}")
        self.aggr = aggr

    def message(self, x_j):
        return x_j

    def propagate(self, edge_index, x=None, **kwargs):
        src, dst = edge_index[0], edge_index[1]
        messages = self.message(x[src])
        out = torch.zeros(
            (x.size(0),) + messages.shape[1:],
            dtype=messages.dtype,
            device=messages.device,
        )
        out.index_add_(0, dst, messages)
        return out


def knn_graph(*args, **kwargs):  # imported by data_utils.py:3, never called
    raise NotImplementedError("knn_graph is unused by the reference")
