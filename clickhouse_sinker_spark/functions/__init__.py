from . import casts, hashing, text  # noqa: F401

from .casts import (  # noqa: F401
    saturating_cast,
    cast_with_default,
    default_literal,
    parse_datetime_any,
    epoch_to_timestamp,
    valid_ip_or_default,
)
from .hashing import (  # noqa: F401
    shard_stripe,
    shard_hash,
    shard_knuth,
    sorting_key_shard,
    minhash_signature,
    simhash64,
    fingerprint_md5,
)
from .text import (  # noqa: F401
    char_ngrams,
    word_shingles,
    positional_ngrams,
    pii_patterns,
    pii_scrub,
    token_count,
    quality_features,
    langid_expr,
)
