from .cdc import CDCEngine  # noqa: F401
