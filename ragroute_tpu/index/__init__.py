"""Corpus shards: HBM-resident dense embedding indexes + host doc stores."""

from ragroute_tpu.index.shard import DeviceShard, ShardSet
from ragroute_tpu.index.synthetic import SyntheticWorld, make_synthetic_world

__all__ = ["DeviceShard", "ShardSet", "SyntheticWorld", "make_synthetic_world"]
