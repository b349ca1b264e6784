package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-domain suites; every entry with a
  * DuckDB-expressible oracle also appears in `oracleSql` with IDENTICAL
  * output column names (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  private lazy val suites: Map[String, ((SparkSession, String) => DataFrame, Option[String])] =
    queries_relational ++ queries_llm ++ queries_tableformat

  private def queries_relational = graft.queries.Relational.all
  private def queries_llm = graft.queries.Llm.all
  private def queries_tableformat = graft.queries.TableFormat.all

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    suites.map { case (k, (f, _)) => k -> f }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    suites.collect { case (k, (_, Some(sql))) => k -> sql.trim }

  /** Headline subset run by Bench (sf0.1): relational core + the
    * training-data pipeline operators (dedup / similarity / multimodal). */
  def benchQueries: Seq[String] = Seq(
    "q01_pricing_summary", "q03_top_revenue_orders", "q05_local_supplier_volume",
    "q06_forecast_revenue", "q08_top_orders_per_customer", "q09_running_user_spend",
    "q16_events_daily",
    "q24_dedup_exact", "q26_dedup_minhash", "q27b_dedup_simhash_banded",
    "q28_embed_topk", "q29b_embed_neardup_bucketed", "q30_ann_lsh",
    "q123_sq8_ann", "q131_ivfpq_ann", "q139_semdedup",
    "q95_span_dedup", "q97_unigram_xent", "q104_asof_purchase_click",
    "q138_seq_packing", "q178_unigram_train", "q194_doremi_weights",
    "q33_mor_compaction_roundtrip", "q57_publish_many_groups",
    "q180_publish_put_profile")

  /** Bench entries that time the WRITE path (table build + mutation);
    * everything else in [[benchQueries]] times reads. Reported as
    * separate totals so read regressions aren't masked by write noise. */
  def writePathQueries: Set[String] =
    Set("q33_mor_compaction_roundtrip", "q57_publish_many_groups",
      "q180_publish_put_profile")
}
