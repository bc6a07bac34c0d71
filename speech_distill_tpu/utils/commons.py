"""Global seeding (reference soulxpodcast/utils/commons.py:6-10)."""
from __future__ import annotations

import random

import numpy as np


def set_all_random_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)
    try:
        import torch
        torch.manual_seed(seed)
    except ImportError:
        pass
