from .change_stream import ChangeStreamSource  # noqa: F401
from .incremental import IncrementalTableSource  # noqa: F401
from .tabular import RaggedGridSource  # noqa: F401
