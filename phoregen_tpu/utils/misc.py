"""Small host utilities (parity: reference `utils/misc.py`)."""
from __future__ import annotations

import json
import os
import pickle
import random
from typing import Any

import numpy as np
import yaml


def seed_all(seed: int) -> None:
    """Seed host RNGs (reference `utils/misc.py:29-32`). Device randomness
    is explicit-key (jax.random) and needs no global seeding."""
    random.seed(seed)
    np.random.seed(seed)


def load_yaml(path: str) -> Any:
    with open(path) as f:
        return yaml.safe_load(f)


def save_yaml(path: str, obj: Any) -> None:
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(obj, f)


def load_json(path: str) -> Any:
    with open(path) as f:
        return json.load(f)


def save_json(path: str, obj: Any) -> None:
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=1, default=str)


def load_pkl(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_pkl(path: str, obj: Any) -> None:
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f)
