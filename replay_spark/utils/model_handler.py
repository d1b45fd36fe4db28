"""Generic model persistence: save/load any recommender by name.

Parity: reference ``utils/model_handler.py`` — a registry keyed by
the class name stored in the model directory's metadata.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

from pyspark.sql import SparkSession

__all__ = ["save", "load"]


def _registry() -> dict:
    import replay_spark.ann as a
    import replay_spark.models as m

    reg = {
        name: cls
        for name, cls in vars(m).items()
        if isinstance(cls, type)
    }
    # ANN indexes share the meta.json {"class": ...} contract, so a
    # saved index loads through the same front door as any model
    reg.update(
        {
            name: cls
            for name, cls in vars(a).items()
            if isinstance(cls, type)
        }
    )
    return reg


def save(model, path: str) -> None:
    model.save(path)


def load(path: str, spark: Optional[SparkSession] = None):
    """Instantiate and restore whatever model class was saved at path."""
    meta = json.loads((Path(path) / "meta.json").read_text())
    cls = _registry().get(meta["class"])
    if cls is None:
        raise ValueError(f"Unknown model class {meta['class']}")
    return cls.load(path, spark)
