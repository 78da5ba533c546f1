from .runner import ReplayRunner  # noqa: F401
