from odbc2deltalake_spark.streaming.driver import (
    stream_db_to_delta,
    foreach_batch_scd2,
    foreach_batch_append,
)
from odbc2deltalake_spark.streaming.events import (
    windowed_rollup_stream,
    deduped_stream,
    funnel_steps_batch,
    funnel_stream,
    sessionize_batch,
    sessionize_stream,
    clicks_purchases_join_stream,
)
from odbc2deltalake_spark.streaming.materialized import (
    MaterializedAggregate,
    MaterializedDistinct,
)
from odbc2deltalake_spark.streaming.materialized_join import MaterializedJoin
from odbc2deltalake_spark.streaming.table_tailer import TableTailer
from odbc2deltalake_spark.streaming.corpus import (
    corpus_ingest_stream,
    start_corpus_ingest,
    eval_gram_table,
    decontaminate,
)

__all__ = [
    "stream_db_to_delta",
    "foreach_batch_scd2",
    "foreach_batch_append",
    "windowed_rollup_stream",
    "deduped_stream",
    "funnel_steps_batch",
    "funnel_stream",
    "sessionize_batch",
    "sessionize_stream",
    "clicks_purchases_join_stream",
    "MaterializedAggregate",
    "MaterializedDistinct",
    "MaterializedJoin",
    "TableTailer",
    "corpus_ingest_stream",
    "start_corpus_ingest",
    "eval_gram_table",
    "decontaminate",
]
