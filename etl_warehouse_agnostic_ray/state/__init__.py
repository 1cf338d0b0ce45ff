from .atomic import atomic_write_json, read_json  # noqa: F401
from .checkpoint import CheckpointStore  # noqa: F401
from .schema_registry import SchemaRegistry  # noqa: F401
