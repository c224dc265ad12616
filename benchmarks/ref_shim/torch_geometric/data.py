"""Data / Batch containers covering the reference's usage
(`/root/reference/data_utils.py:218`, `train.py:247`)."""

from __future__ import annotations

import torch


class Data:
    """Attribute-bag graph container. Only attributes explicitly set exist
    (`hasattr(data, 'globals')` must be False unless set —
    graph_network.py:62,99,168)."""

    def __init__(self, **kwargs):
        for key, value in kwargs.items():
            setattr(self, key, value)

    def to(self, device):
        for key, value in self.__dict__.items():
            if torch.is_tensor(value):
                setattr(self, key, value.to(device))
        return self

    @property
    def num_nodes(self):
        return self.x.size(0)


class Batch(Data):
    """Disjoint-union batching: node/edge tensors concatenated, edge indices
    offset per graph, `batch[i]` = graph id of node i, `num_graphs`."""

    # Attributes indexed by node (concat along dim 0, no offset).
    _NODE_KEYS = ("x", "y_acc", "y_temp_rate", "pos")

    @classmethod
    def from_data_list(cls, data_list):
        out = cls()
        out.num_graphs = len(data_list)
        for key in cls._NODE_KEYS:
            values = [getattr(g, key, None) for g in data_list]
            if all(v is not None for v in values):
                setattr(out, key, torch.cat(values, dim=0))
        edge_attrs = [g.edge_attr for g in data_list]
        if all(e is not None for e in edge_attrs):
            out.edge_attr = torch.cat(edge_attrs, dim=0)
        offsets, batch_ids, edge_indices = [], [], []
        offset = 0
        for i, g in enumerate(data_list):
            n = g.x.size(0)
            edge_indices.append(g.edge_index + offset)
            batch_ids.append(
                torch.full((n,), i, dtype=torch.long, device=g.x.device)
            )
            offsets.append(offset)
            offset += n
        out.edge_index = torch.cat(edge_indices, dim=1)
        out.batch = torch.cat(batch_ids, dim=0)
        for key in ("dt", "box_size"):
            values = [getattr(g, key, None) for g in data_list]
            if all(v is not None for v in values):
                setattr(out, key, torch.cat(values, dim=0))
        return out
