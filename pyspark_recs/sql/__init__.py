from pyspark_recs.sql.transforms import (
    argmax_per_group,
    bucketize_fixed_width,
    categorify_dictionary,
    dedup_exact,
    dedup_last_value,
    frequency_filter,
    latest_batch,
    left_enrich,
    time_split_label,
    top_k_per_group,
    window_group_stat,
    zscore,
)

__all__ = [
    "argmax_per_group",
    "bucketize_fixed_width",
    "categorify_dictionary",
    "dedup_exact",
    "dedup_last_value",
    "frequency_filter",
    "latest_batch",
    "left_enrich",
    "time_split_label",
    "top_k_per_group",
    "window_group_stat",
    "zscore",
]
