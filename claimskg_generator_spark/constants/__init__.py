from claimskg_generator_spark.constants.namespaces import NS
from claimskg_generator_spark.constants.ratings import (
    NORMALIZED_RATING_VALUES,
    RATING_NORMALIZATION_ROWS,
)
from claimskg_generator_spark.constants.sources import SOURCE_URI_DICT

__all__ = [
    "NS",
    "NORMALIZED_RATING_VALUES",
    "RATING_NORMALIZATION_ROWS",
    "SOURCE_URI_DICT",
]
