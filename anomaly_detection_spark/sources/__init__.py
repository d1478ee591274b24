from .tables import delete_by_query, load_table, write_table  # noqa: F401
