from .builder import append_index, build_index  # noqa: F401
from .merger import force_merge, merge_segments  # noqa: F401
from .storage import IndexMeta, IndexPaths, read_meta  # noqa: F401
