"""Expression-level functions (Column -> Column), composable inside any
DataFrame plan — all JVM-side, whole-stage-codegen eligible.
Re-exported from their implementation modules.
"""

from etl_hero_spark.dedup import (  # noqa: F401
    minhash_signature_expr,
    simhash_expr,
)
from etl_hero_spark.detect import parse_date_expr  # noqa: F401
from etl_hero_spark.er import (  # noqa: F401
    block_key_expr,
    phonetic_block_key_expr,
    similarity_expr,
)
from etl_hero_spark.layout import zorder_expr  # noqa: F401
from etl_hero_spark.multimodal import sniff_mime_expr  # noqa: F401
from etl_hero_spark.pii import luhn_valid_expr  # noqa: F401
from etl_hero_spark.profile import (  # noqa: F401
    dec_avg,
    dec_stddev_pop,
    dec_sum,
    null_count_expr,
)
from etl_hero_spark.simsearch import (  # noqa: F401
    cosine_expr,
    dot_expr,
    norm_expr,
    pq_adc_score_expr,
    pq_codes_expr,
    pq_query_tables_expr,
    quantized_vec,
    signature_expr,
)
from etl_hero_spark.textops import (  # noqa: F401
    bpe_ish_token_count_expr,
    clean_text_expr,
    fingerprint_expr,
    normalized_text_expr,
    shingle_fingerprint_expr,
    shingles_expr,
    token_count_expr,
    tokens_expr,
)
