"""Host transfer helpers (reference utils/processing.py)."""
from __future__ import annotations

import numpy as np


def detach_numpy(x):
    """Device array -> host numpy (the reference's .detach().cpu().numpy())."""
    return np.asarray(x)
