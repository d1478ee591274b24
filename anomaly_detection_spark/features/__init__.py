from .pipeline import (  # noqa: F401
    feature_matrix,
    impute_linear,
    nearest_fill,
    shingles,
)
