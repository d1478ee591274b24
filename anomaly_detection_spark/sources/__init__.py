from .ingest import apply_ingest_pipeline  # noqa: F401
from .transform import transform_read, transform_run  # noqa: F401
from .tables import (delete_by_query, load_table, reindex,  # noqa: F401
                     update_by_query, write_table)
