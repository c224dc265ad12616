"""DataLoader shim: the reference's dataset yields plain dict-of-tensor
samples (`/root/reference/dataloader.py:152-159`), for which PyG's DataLoader
falls back to torch's default collate — so torch's own DataLoader is the
exact same behavior."""

from torch.utils.data import DataLoader  # noqa: F401
