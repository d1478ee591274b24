from .builder import append_index, build_index  # noqa: F401
from .merger import force_merge, merge_segments  # noqa: F401
from .snapshots import (list_snapshots, restore_index,  # noqa: F401
                        snapshot_index)
from .storage import IndexMeta, IndexPaths, read_meta  # noqa: F401
from .star_tree import build_star_tree, star_tree_search  # noqa: F401
