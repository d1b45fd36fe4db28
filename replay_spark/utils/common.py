"""Generic persistence entry points.

Parity: reference ``utils/common.py:62-83`` — ``save_to_replay`` /
``load_from_replay`` dispatch on the class name recorded in the
saved directory, covering models (``meta.json``, written by
``models/base.py:save``) and splitters/encoders/discretizers
(``<path>.replay/init_args.json`` with ``_class_name``).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

from pyspark.sql import SparkSession

__all__ = ["save_to_replay", "load_from_replay"]


def save_to_replay(obj, path: str) -> None:
    """Save any RePlay-API object exposing ``save(path)``."""
    obj.save(path)


def _class_registry() -> dict:
    import replay_spark.models as models
    import replay_spark.preprocessing as preprocessing
    import replay_spark.splitters as splitters

    out: dict = {}
    for mod in (models, splitters, preprocessing):
        for name, cls in vars(mod).items():
            if isinstance(cls, type):
                out.setdefault(name, cls)
    return out


def load_from_replay(path: str, spark: Optional[SparkSession] = None):
    """Load whatever object was saved at ``path`` (model, splitter,
    encoder, discretizer), dispatching on the recorded class name."""
    replay_dir = Path(path).with_suffix(".replay").resolve()
    init_args = replay_dir / "init_args.json"
    if init_args.exists():
        payload = json.loads(init_args.read_text())
        cls = _class_registry().get(payload["_class_name"])
        if cls is None:
            raise ValueError(f"Unknown class {payload['_class_name']}")
        return cls.load(path)
    meta = Path(path) / "meta.json"
    if meta.exists():
        from replay_spark.utils.model_handler import load as load_model

        return load_model(path, spark)
    raise FileNotFoundError(
        f"No RePlay object found at {path} (neither "
        f"{init_args} nor {meta} exists)"
    )
