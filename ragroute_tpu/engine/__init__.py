"""The federated search engine: route → score → merge as one device program."""

from ragroute_tpu.engine.engine import FederatedSearchEngine, SearchOutput

__all__ = ["FederatedSearchEngine", "SearchOutput"]
