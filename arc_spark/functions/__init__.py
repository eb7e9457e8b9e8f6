"""Column-level functions (all JVM-side Catalyst expressions — no Python UDFs
in the hot path)."""

from arc_spark.functions.time import (  # noqa: F401
    time_bucket,
    normalize_epoch_to_timestamp,
    register_sql_functions,
)
from arc_spark.functions.text import (  # noqa: F401
    normalize_ws,
    ws_token_count,
    regex_token_count,
    fingerprint_md5,
    rolling_hash,
    word_shingles,
    char_shingles,
    lang_scores,
    lang_id,
    quality_score,
    normalize_url,
    normalize_url_df,
    normalize_url_sql,
    redact_pii,
)
from arc_spark.functions.sampling import (  # noqa: F401
    hash_bucket,
    hash_split,
    mixture_filter,
    stratified_cap,
)
from arc_spark.functions.threads import (  # noqa: F401
    pin_math_threads,
    task_thread_budget,
)
from arc_spark.functions.vector import dot, l2_norm, cosine_similarity  # noqa: F401
