from .ingest import apply_ingest_pipeline  # noqa: F401
from .transform import (rollup_aggs, transform_read,  # noqa: F401
                        transform_run)
from .tables import (delete_by_query, load_table, reindex,  # noqa: F401
                     update_by_query, write_table)
