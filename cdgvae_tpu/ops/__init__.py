from . import flows, causal, losses  # noqa: F401
