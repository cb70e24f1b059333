"""Operator library — the reference's operator inventory (SURVEY.md §2)
re-expressed as composable ``DataFrame -> DataFrame`` functions over the
public PySpark API. Each module's docstring cites the reference file it
covers; none of them touch Catalyst internals — the logical plan is
declared via DataFrame/SQL and Catalyst/AQE pick the physical strategy.
"""

from audience_behavior_semantic_etl_spark.operators.projection import (  # noqa: F401
    add_columns,
    case_nested,
    case_using_equals,
    case_using_like,
    drop_columns,
    rename_columns,
    select_columns,
    sql_add_columns,
)
from audience_behavior_semantic_etl_spark.operators.filters import filter_rows  # noqa: F401
from audience_behavior_semantic_etl_spark.operators.joins import (  # noqa: F401
    perform_join,
    perform_join_ex,
)
from audience_behavior_semantic_etl_spark.operators.aggregates import (  # noqa: F401
    aggregate_columns,
    drop_duplicate_rows,
    drop_duplicate_rows_ordered,
    sum_maps,
)
from audience_behavior_semantic_etl_spark.operators.flatten import (  # noqa: F401
    flatten_array_field,
    parse_url_columns,
)
from audience_behavior_semantic_etl_spark.operators.sessionize import sessionize  # noqa: F401

# Training-data pipeline operators (beyond the reference inventory;
# full surfaces live in their modules — these are the headline entry
# points a pipeline composes).
from audience_behavior_semantic_etl_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    near_dedup,
    near_dedup_pairs,
)
from audience_behavior_semantic_etl_spark.operators.curation import (  # noqa: F401
    contamination_stats,
    decontaminate,
    exact_stratified_sample,
    materialize_sequences,
    pack_sequences,
    stratified_sample,
)
from audience_behavior_semantic_etl_spark.operators.text import (  # noqa: F401
    redact_pii,
    text_profile,
)
from audience_behavior_semantic_etl_spark.operators.joins import (  # noqa: F401
    as_of_join,
    range_join,
)
from audience_behavior_semantic_etl_spark.operators.rollup import (  # noqa: F401
    hypertable_rollup,
    time_bucket,
)
from audience_behavior_semantic_etl_spark.operators.dedup import (  # noqa: F401
    duplicated_spans,
    span_dedup_stats,
)
from audience_behavior_semantic_etl_spark.operators.curation import (  # noqa: F401
    threshold_stratified_sample,
)
from audience_behavior_semantic_etl_spark.operators.text import (  # noqa: F401
    repetition_score,
)
