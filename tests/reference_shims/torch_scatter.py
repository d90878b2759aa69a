"""Minimal pure-torch shim for the torch_scatter package (absent in this env),
so the reference implementation at /root/reference can run for golden tests."""

import torch


def scatter(src, index, dim=0, dim_size=None, reduce="add"):
    if dim_size is None:
        dim_size = int(index.max()) + 1 if index.numel() else 0
    shape = list(src.shape)
    shape[dim] = int(dim_size)
    index = index.long()
    if reduce in ("add", "sum"):
        out = torch.zeros(shape, dtype=src.dtype)
        return out.index_add(dim, index, src)
    if reduce == "mean":
        out = torch.zeros(shape, dtype=src.dtype)
        out = out.index_add(dim, index, src)
        ones = torch.ones(src.shape[dim], dtype=src.dtype)
        counts = torch.zeros(int(dim_size), dtype=src.dtype).index_add(0, index, ones)
        counts = counts.clamp(min=1)
        view = [1] * out.dim()
        view[dim] = -1
        return out / counts.view(view)
    raise NotImplementedError(reduce)
