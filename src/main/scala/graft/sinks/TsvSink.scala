package graft.sinks

import graft.sources.PrometheusJson
import org.apache.spark.sql.DataFrame

/** ClickHouse-shaped bulk-load sink: renders metric rows to TabSeparated
  * lines (R3 escaping, R4 float formatting) and appends them as text
  * part-files — the file pile a `clickhouse-client --query "INSERT ...
  * FORMAT TabSeparated"` loop consumes, closing the reference's
  * insert_from_file path (clickhouse_client.py:131-218). Writing
  * part-files (not one file) keeps the sink parallel and idempotent per
  * micro-batch; the reference gets idempotency from content-hash ids +
  * ReplacingMergeTree (R5/R9), which is unchanged here — replayed
  * batches produce identical lines that collapse on merge.
  */
object TsvSink {
  def write(metrics: DataFrame, dir: String): Unit =
    PrometheusJson.tsvLines(metrics)
      .write.mode("append").text(dir)
}
