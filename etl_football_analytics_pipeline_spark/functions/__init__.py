from .cleaning import (
    canonicalize_via_map,
    dec,
    div0,
    encode_season,
    lenient_long,
    normalize_str,
    split_two,
    strip_tokens,
    zero_pad,
)

__all__ = [
    "canonicalize_via_map",
    "dec",
    "div0",
    "encode_season",
    "lenient_long",
    "normalize_str",
    "split_two",
    "strip_tokens",
    "zero_pad",
]
