from .types import Features, MatchPairs  # noqa: F401
