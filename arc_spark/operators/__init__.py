"""DataFrame-level operators: dedup family, similarity search, as-of join,
compaction, lifecycle (retention / predicate delete), backup/restore,
duplicate-cluster closure, repetition-quality gates, token packing."""

from arc_spark.operators.dedup import (  # noqa: F401
    dedup_exact,
    dedup_last_writer_wins,
    minhash_signatures,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup_pairs,
    embedding_near_dup_pairs,
)
from arc_spark.operators.asof import asof_join  # noqa: F401
from arc_spark.operators.similarity import (  # noqa: F401
    brute_force_topk,
    kmeans_assign,
    lsh_bucketed_topk,
    ivf_topk,
)
from arc_spark.operators.quality import repetition_profile  # noqa: F401
from arc_spark.operators.tiering import migrate_to_cold, tier_report  # noqa: F401
from arc_spark.operators.backup import (  # noqa: F401
    create_backup,
    list_backups,
    restore_backup,
    verify_backup,
)
from arc_spark.operators.clustering import (  # noqa: F401
    canonical_docs,
    connected_components,
)
from arc_spark.operators.lifecycle import apply_retention, delete_where  # noqa: F401
from arc_spark.operators.packing import pack_token_shards  # noqa: F401
from arc_spark.operators.reconciliation import Reconciler  # noqa: F401
from arc_spark.operators.dedup import (  # noqa: F401
    duplicated_window_fraction,
    semantic_dedup,
)
