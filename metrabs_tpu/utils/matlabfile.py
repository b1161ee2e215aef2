"""Matlab .mat loading with struct curing (`metrabs_tf/matlabfile.py`
equivalent): mat_structs become plain nested dicts, so benchmark annotation
files (MuPoTS etc.) read as regular Python data."""

from __future__ import annotations

from typing import Any

import numpy as np
import scipy.io


def load(path: str) -> dict:
    data = scipy.io.loadmat(path, struct_as_record=False, squeeze_me=True)
    return {k: _cure(v) for k, v in data.items() if not k.startswith('__')}


def _cure(value: Any) -> Any:
    if isinstance(value, scipy.io.matlab.mat_struct):
        return {name: _cure(getattr(value, name)) for name in value._fieldnames}
    if isinstance(value, np.ndarray) and value.dtype == object:
        return np.array([_cure(v) for v in value.ravel()],
                        dtype=object).reshape(value.shape)
    return value
