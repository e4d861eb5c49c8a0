from .coercion import (
    CoercionResult,
    coerce_array,
    coerce_bool,
    coerce_date,
    coerce_integer,
    coerce_number,
    coerce_object,
    coerce_string,
    coerce_time_of_day,
    coerce_timestamp,
    coerce_timestamp_zoned,
    verdict_rank,
)
from .flac import decode_flac, encode_flac, parse_flac_streaminfo
from .keys import chameleon_key, case_insensitive_key, detect_case, normalize_keys_map

__all__ = [
    "CoercionResult",
    "coerce_array",
    "coerce_bool",
    "coerce_date",
    "coerce_integer",
    "coerce_number",
    "coerce_object",
    "coerce_string",
    "coerce_time_of_day",
    "coerce_timestamp",
    "coerce_timestamp_zoned",
    "verdict_rank",
    "decode_flac",
    "encode_flac",
    "parse_flac_streaminfo",
    "chameleon_key",
    "case_insensitive_key",
    "detect_case",
    "normalize_keys_map",
]
