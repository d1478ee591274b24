from .bm25 import bm25_idf, bm25_score, bm25_term_weight  # noqa: F401
from .codecs import (  # noqa: F401
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    varint_decode,
    varint_encode,
    varint_encode_with_widths,
)
from .entity import entity_value, with_entity  # noqa: F401
from .tokenizer import tokenize_column, tokenize_texts  # noqa: F401
from .geo import (  # noqa: F401
    geo_columns,
    geohash_encode,
    geohash_key,
    geotile_key,
    haversine_m,
    parse_distance,
    parse_point,
    point_in_polygon,
)
