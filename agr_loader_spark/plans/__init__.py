from .merge import plan_changeset  # noqa: F401
