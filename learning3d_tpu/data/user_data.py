"""Bring-your-own-data adapters (reference data_utils/user_data.py:5-119):
validate shapes, reshape, and expose the standard dataset protocol for
classification / registration / segmentation / flow arrays."""

from __future__ import annotations

import numpy as np


def _check(arr, name, ndim, last=None):
    arr = np.asarray(arr)
    if arr.ndim != ndim:
        raise ValueError(f"{name} must have {ndim} dims, got {arr.ndim}")
    if last is not None and arr.shape[-1] != last:
        raise ValueError(f"{name} must have trailing dim {last}, got {arr.shape[-1]}")
    return arr


class UserData:
    """dict-driven dataset.

    application='classification': data = {'pcs': (B,N,3), 'labels': (B,)}
    application='registration':   data = {'template': (B,N,3), 'source':
        (B,N,3), 'transformation': (B,4,4)}
    application='flow_estimation': data = {'frame1': (B,N,3), 'frame2':
        (B,N,3), 'flow': (B,N,3)}
    """

    def __init__(self, application: str, data: dict):
        self.application = application
        if application == "classification":
            self.pcs = _check(data["pcs"], "pcs", 3, 3).astype(np.float32)
            self.labels = np.asarray(data["labels"]).reshape(-1).astype(np.int64)
            if len(self.pcs) != len(self.labels):
                raise ValueError("pcs and labels length mismatch")
        elif application == "registration":
            self.template = _check(data["template"], "template", 3).astype(np.float32)
            self.source = _check(data["source"], "source", 3).astype(np.float32)
            self.transformation = _check(
                data["transformation"], "transformation", 3
            ).astype(np.float32)
            if self.transformation.shape[-2:] != (4, 4):
                raise ValueError("transformation must be (B, 4, 4)")
        elif application == "flow_estimation":
            self.frame1 = _check(data["frame1"], "frame1", 3, 3).astype(np.float32)
            self.frame2 = _check(data["frame2"], "frame2", 3, 3).astype(np.float32)
            self.flow = _check(data["flow"], "flow", 3, 3).astype(np.float32)
        else:
            raise ValueError(f"unknown application {application!r}")

    def __len__(self):
        if self.application == "classification":
            return len(self.pcs)
        if self.application == "registration":
            return len(self.template)
        return len(self.frame1)

    def __getitem__(self, idx):
        if self.application == "classification":
            return self.pcs[idx], int(self.labels[idx])
        if self.application == "registration":
            return self.template[idx], self.source[idx], self.transformation[idx]
        return self.frame1[idx], self.frame2[idx], self.flow[idx]
