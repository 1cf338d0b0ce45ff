from .lww import lww_compact_table, merge_partition_group, partition_merger  # noqa: F401
from .normalize import NormalizeEvents  # noqa: F401
