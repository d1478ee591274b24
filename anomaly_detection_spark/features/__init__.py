from .pipeline import (  # noqa: F401
    feature_matrix,
    impute_fill,
    impute_linear,
    nearest_fill,
    shingles,
)
from .scoring import score_entities, zscore_scorer  # noqa: F401
