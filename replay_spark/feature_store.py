"""Feature-store read path: point-in-time-correct joins of a label
spine against versioned feature tables.

The training-data operation every large-scale ML pipeline needs and
Spark lacks as a primitive (the Feast / "point-in-time join" shape,
public semantics): given a spine of (entity keys, event time) label
rows, attach to each row the LATEST value of every feature as of
that row's time — never a later one (no label leakage) — and only if
the feature observation is fresher than the view's ``ttl``.

Built Spark-first from pieces this repo already proved at scale:

* each :class:`FeatureView` resolves to one backward
  :func:`~replay_spark.utils.spark_utils.asof_join` — the
  union + single-hash-shuffle + ordered-window merge (linear work
  per entity key, no range self-join, no BroadcastNestedLoopJoin);
* a view backed by a :class:`~replay_spark.lake.LakeTable` reads a
  PINNED snapshot version (training reproducibility: re-running the
  join after new feature writes returns the same rows) through the
  stats-pruned scan (``read_where``): the spine's [min - ttl, max]
  time interval is computed with one tiny aggregate and used to
  skip feature files whose footer range cannot match — at 100 TB
  the feature history is years deep and a training window touches
  days, so pruning is the difference between scanning the table and
  scanning the slice.

Feature name collisions across views are impossible by
construction: output columns are ``<view>__<feature>``.

No reference counterpart (the reference has no feature-store or
temporal-join machinery) — LLM/ML-pipeline extension tier.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from replay_spark.utils.spark_utils import asof_join

__all__ = ["FeatureView", "FeatureStore"]


@dataclass
class FeatureView:
    """One versioned feature table.

    Parameters
    ----------
    name: output-column prefix (``<name>__<feature>``).
    source: a DataFrame, or a :class:`~replay_spark.lake.LakeTable`
        (anything with ``read(version)``/``read_where(bounds,
        version)``) for snapshot-pinned, stats-pruned reads.
    entity_columns: join keys shared with the spine.
    features: feature columns to attach (default: every non-key,
        non-timestamp column).
    timestamp_column: feature observation time.
    ttl_seconds: max staleness — a feature older than this at spine
        time attaches as null. ``None`` = unbounded lookback.
    version: lake snapshot to pin (``None`` = latest at plan time).
    """

    name: str
    source: object
    entity_columns: Sequence[str]
    features: Optional[Sequence[str]] = None
    timestamp_column: str = "ts"
    ttl_seconds: Optional[float] = None
    version: Optional[int] = None

class FeatureStore:
    """Point-in-time join over a set of :class:`FeatureView`\\ s."""

    def __init__(self, views: Sequence[FeatureView]):
        names = [v.name for v in views]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate view names: {names}")
        self.views = list(views)

    def point_in_time_join(
        self,
        spine: DataFrame,
        spine_ts: str = "ts",
        prune: bool = True,
    ) -> DataFrame:
        """Attach every view's features to ``spine`` as of each
        spine row's ``spine_ts`` — the training-set materialization
        read. One backward as-of merge per view (each a single hash
        shuffle on that view's entity keys); lake-backed views scan
        only the files overlapping the spine's time interval.

        ``prune=False`` skips the spine min/max pre-aggregate (two
        extra tiny jobs) — use when the spine spans the full table
        anyway.
        """
        interval = None
        if prune and any(
            not isinstance(v.source, DataFrame) for v in self.views
        ):
            row = spine.agg(
                F.min(spine_ts).alias("lo"), F.max(spine_ts).alias("hi")
            ).collect()[0]
            interval = (row["lo"], row["hi"])
        out = spine
        for view in self.views:
            bounds = None
            if interval is not None:
                lo, hi = interval
                if view.ttl_seconds is not None and lo is not None:
                    # bounded staleness bounds the lookback: features
                    # older than spine_min - ttl can never attach
                    import datetime

                    if isinstance(lo, (int, float)):
                        # numeric-epoch spine timestamps
                        lo = lo - view.ttl_seconds
                    else:
                        lo = lo - datetime.timedelta(
                            seconds=view.ttl_seconds
                        )
                else:
                    # no ttl = unbounded backward lookback — only the
                    # upper end (nothing AFTER the latest spine row
                    # can ever match a backward as-of) may prune
                    lo = None
                bounds = (lo, hi)
            feat_df, feats = self._resolve_view(view, bounds)
            out_names = list(feats)
            if view.timestamp_column != spine_ts:
                if spine_ts in view.entity_columns:
                    raise ValueError(
                        f"FeatureView {view.name!r}: entity column "
                        f"{spine_ts!r} collides with the spine "
                        "timestamp name — rename one of them"
                    )
                if spine_ts in feats:
                    # a feature shadows the spine-time name: move it
                    # aside so the renamed as-of 'on' column stays
                    # unambiguous; output alias keeps the real name
                    shadow = f"__feat__{spine_ts}"
                    feat_df = feat_df.withColumnRenamed(
                        spine_ts, shadow
                    )
                    feats = [
                        shadow if c == spine_ts else c for c in feats
                    ]
                feat_df = feat_df.withColumnRenamed(
                    view.timestamp_column, spine_ts
                )
            joined = asof_join(
                out,
                feat_df,
                on=spine_ts,
                by=list(view.entity_columns),
                direction="backward",
                tolerance=view.ttl_seconds,
                suffix="__r",
            )
            renames = [F.col(c) for c in out.columns] + [
                F.col(f"{c}__r").alias(f"{view.name}__{n}")
                for c, n in zip(feats, out_names)
            ]
            out = joined.select(*renames)
        return out

    @staticmethod
    def _resolve_view(view: FeatureView, bounds: Optional[tuple]):
        src = view.source
        if isinstance(src, DataFrame):
            df = src
        elif hasattr(src, "read_where") and bounds is not None:
            df, _, _ = src.read_where(
                {view.timestamp_column: bounds}, version=view.version
            )
        elif hasattr(src, "read"):
            df = src.read(version=view.version)
        else:
            raise TypeError(
                f"FeatureView {view.name!r}: source must be a "
                "DataFrame or a LakeTable-like object"
            )
        feats = (
            list(view.features)
            if view.features is not None
            else [
                c
                for c in df.columns
                if c not in view.entity_columns
                and c != view.timestamp_column
            ]
        )
        return (
            df.select(
                *view.entity_columns, view.timestamp_column, *feats
            ),
            feats,
        )
