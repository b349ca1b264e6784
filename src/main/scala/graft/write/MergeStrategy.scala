package graft.write

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** Pluggable per-key merge semantics — the rebuild's analog of the
  * reference's user-supplied payload class
  * (`hoodie.datasource.write.payload.class`,
  * DataSourceOptions.scala:258; contract
  * common/model/HoodieRecordPayload.java:45): where the reference
  * classloads a JVM class that combines two Avro records at a time, a
  * graft strategy declares (a) how a key's versions RANK and (b) an
  * optional projection across every retained version — both as Catalyst
  * columns, so custom semantics stay inside whole-stage codegen and one
  * window pass, never a per-record lambda.
  *
  * `TableConfig.mergeStrategy` stores the strategy NAME; resolution
  * happens at merge time through [[MergeStrategies]]. Like the
  * reference's payload classpath contract, a session that writes or
  * reads a table with a custom strategy must register it first
  * (`MergeStrategies.register`); the built-ins are always present.
  */
trait MergeStrategy extends Serializable {

  /** Rank columns for a key's versions, best-first: row 1 of a window
    * ordered by this wins the merge. `ordering` is the configured
    * ordering/event-time column (a null-safe literal 0 when the table
    * has none); `commitTime`/`seqno` give arrival order. */
  def priority(ordering: Column, commitTime: Column, seqno: Column): Seq[Column]

  /** Optional projection across ALL of a key's retained versions before
    * the winner is picked (partial_update-style column inheritance).
    * `frame` is the full-group window in [[priority]] order;
    * `dataCols` are the non-meta columns to transform; `deleted` marks
    * tombstone rows (their columns must pass through untouched);
    * `live` is false for rows shadowed by a newer tombstone — values of
    * dead rows must not leak into live output. Default: identity. */
  def project(df: DataFrame, frame: WindowSpec, dataCols: Seq[String],
      deleted: Column, live: Column): DataFrame = df
}

/** latest ordering value wins; ties -> newest commit
  * (OverwriteWithLatestAvroPayload.java:33 analog). */
object OverwriteLatestStrategy extends MergeStrategy {
  override def priority(ordering: Column, commitTime: Column, seqno: Column) =
    Seq(ordering.desc_nulls_last, commitTime.desc, seqno.desc)
}

/** latest ordering value wins; ties -> the STORED (older-commit) row
  * (DefaultHoodieRecordPayload.needUpdatingPersistedRecord `>=`,
  * DefaultHoodieRecordPayload.java:102). */
object EventTimeStrategy extends MergeStrategy {
  override def priority(ordering: Column, commitTime: Column, seqno: Column) =
    Seq(ordering.desc_nulls_last, commitTime.asc, seqno.asc)
}

/** overwrite_latest ranking + each column takes its first non-null
  * value in priority order across live versions
  * (OverwriteNonDefaultsWithLatestAvroPayload.java:31 analog; see the
  * order-insensitivity contract note at GraftTable.partialUpdate). */
object PartialUpdateStrategy extends MergeStrategy {
  override def priority(ordering: Column, commitTime: Column, seqno: Column) =
    Seq(ordering.desc_nulls_last, commitTime.desc, seqno.desc)
  override def project(df: DataFrame, frame: WindowSpec, dataCols: Seq[String],
      deleted: Column, live: Column): DataFrame = {
    val dataSet = dataCols.toSet
    df.select(df.columns.toSeq.map { c =>
      if (!dataSet.contains(c)) col(c)
      else when(deleted, col(c))
        .otherwise(first(when(live, col(c)), ignoreNulls = true).over(frame))
        .as(c)
    }: _*)
  }
}

/** Additive counter semantics: every column in `counterCols` merges by
  * SUMMING the key's live versions instead of picking one — the
  * strategy behind incrementally-maintained aggregate tables (metric
  * rollups, per-key counters), where each upsert carries a DELTA and
  * the stored row holds the running total. Non-counter columns keep
  * overwrite_latest semantics (the newest version's value wins).
  *
  * Correct under every physical layout by construction: the sum runs
  * over ALL live retained versions (COW stored row + incoming, or MOR
  * base + any number of delta rows), so compaction folding deltas into
  * the base never changes the answer — the folded base simply carries
  * the partial sum the deltas used to. A tombstone resets the counter:
  * versions at or below a key's newest tombstone are dead and excluded
  * from the frame by the merge pre-filter.
  *
  * Contract: batches must be pre-aggregated to one row per key —
  * intra-batch duplicates go through precombine's pick-one semantics
  * BEFORE the merge and would not be summed. Parameterized, so it is
  * not pre-registered: `MergeStrategies.register("my_counts", new
  * AdditiveStrategy(Set(...)))` before writing or reading the table
  * (the same register-before-use contract as any custom strategy). */
class AdditiveStrategy(counterCols: Set[String]) extends MergeStrategy {
  require(counterCols.nonEmpty, "AdditiveStrategy needs at least one counter column")
  override def priority(ordering: Column, commitTime: Column, seqno: Column) =
    Seq(ordering.desc_nulls_last, commitTime.desc, seqno.desc)
  override def project(df: DataFrame, frame: WindowSpec, dataCols: Seq[String],
      deleted: Column, live: Column): DataFrame = {
    // a misspelled counter column would silently degrade to
    // overwrite-latest (last delta stored instead of the running total)
    val missing = counterCols -- dataCols.toSet
    require(missing.isEmpty,
      s"AdditiveStrategy counter column(s) ${missing.mkString(", ")} " +
        s"not found among the table's data columns ${dataCols.mkString(", ")}")
    val counters = dataCols.filter(counterCols.contains).toSet
    df.select(df.columns.toSeq.map { c =>
      if (!counters.contains(c)) col(c)
      else when(deleted, col(c))
        .otherwise(sum(when(live, col(c))).over(frame))
        .as(c)
    }: _*)
  }
}

/** Name -> strategy registry. Built-ins are pre-registered; custom
  * strategies register once per JVM/session before the table is
  * written or read (mirroring the reference's requirement that the
  * payload class be on every executor's classpath). */
object MergeStrategies {
  private val registry =
    scala.collection.concurrent.TrieMap[String, MergeStrategy](
      "overwrite_latest" -> OverwriteLatestStrategy,
      "event_time" -> EventTimeStrategy,
      "partial_update" -> PartialUpdateStrategy)

  def register(name: String, strategy: MergeStrategy): Unit = {
    require(name.nonEmpty, "strategy name must be non-empty")
    registry.put(name, strategy)
  }

  def apply(name: String): MergeStrategy =
    registry.getOrElse(name, throw new IllegalArgumentException(
      s"unknown merge strategy '$name': built-ins are " +
        "overwrite_latest | event_time | partial_update; custom " +
        "strategies must be registered via MergeStrategies.register " +
        "before the table is written or read"))

  def known(name: String): Boolean = registry.contains(name)
}
