package org.apache.spark.sql.graft

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.execution.datasources.orc.OrcFileFormat
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.util.SerializableConfiguration

/** Direct per-group staged write, bypassing the Hadoop commit protocol.
  *
  * A many-group commit (the table format's file-per-group layout) through
  * `DataFrameWriter.partitionBy` pays, PER FILE: a `_temporary` task
  * directory, a task-commit rename, a job-commit merge walk, and an
  * `_SUCCESS`-era checksum dance — measured at ~3 ms/file, it is the
  * publish-path floor at thousands of groups (guide §2.4/§6: remove
  * work, not tune it). The staged write needs none of that protocol:
  * the staging directory itself is the transaction (its files become
  * visible only via commit metadata written AFTER the moves; an aborted
  * write deletes the whole directory), and group files are
  * deterministically named, so a retried task simply overwrites its
  * predecessor's partial output (write-then-rename per file keeps a
  * concurrently-read partial invisible even mid-task).
  *
  * This writer opens Spark's own columnar [[org.apache.spark.sql.execution.datasources.OutputWriter]]
  * (parquet/orc — same encoders, codecs and footer stats as the
  * `partitionBy` path, so published files are byte-compatible with what
  * the previous staged write produced) once per group run inside each
  * sorted task partition: rows MUST arrive clustered by the group
  * columns (the caller's repartition+sortWithinPartitions guarantees
  * runs), written straight to the final staged name. */
object GroupedFileWriter {

  /** Phase-split microbenchmark: write `n` copies of `rows` as separate
    * tiny parquet files on the DRIVER, timing newInstance / write / close
    * separately. Experiment tooling only. */
  def microbench(
      spark: org.apache.spark.sql.SparkSession,
      sample: DataFrame,
      destDir: String,
      n: Int): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val dataSchema = sample.schema
    val rows = sample.queryExecution.toRdd.collect().map(_.copy())
    val job = Job.getInstance(classic.sessionState.newHadoopConf())
    val factory = new ParquetFileFormat().prepareWrite(classic, job, Map.empty, dataSchema)
    val tac = new TaskAttemptContextImpl(job.getConfiguration,
      new TaskAttemptID(new TaskID(new JobID("graftmb", 0), TaskType.MAP, 0), 0))
    val ext = factory.getFileExtension(tac)
    // poor-man's profiler: sample this thread's stack every 2 ms during
    // the open phase and histogram the deepest interesting frame
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val target = Thread.currentThread()
    @volatile var sampling = true
    val exemplar = new java.util.concurrent.atomic.AtomicReference[String](null)
    val sampler = new Thread(() => {
      while (sampling) {
        val st = target.getStackTrace
        if (st.exists(_.getMethodName == "runCommand") && exemplar.get == null)
          exemplar.set(st.take(28).mkString("\n    "))
        val frame = st.find(f =>
          f.getClassName.startsWith("org.apache.parquet") ||
          f.getClassName.startsWith("org.apache.hadoop") ||
          f.getClassName.startsWith("org.xerial") ||
          f.getClassName.contains("Codec") ||
          f.getClassName.contains("parquet"))
          .map(f => s"${f.getClassName}.${f.getMethodName}")
          .getOrElse(st.drop(2).headOption.map(f => s"${f.getClassName}.${f.getMethodName}").getOrElse("?"))
        hist.merge(frame, 1, (a, b) => a + b)
        Thread.sleep(2)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    var tOpen = 0L; var tWrite = 0L; var tClose = 0L
    (0 until n).foreach { i =>
      val p = new Path(destDir, f"mb-$i%05d$ext")
      val t0 = System.nanoTime()
      val w = factory.newInstance(p.toString, dataSchema, tac)
      val t1 = System.nanoTime()
      rows.foreach(w.write)
      val t2 = System.nanoTime()
      w.close()
      val t3 = System.nanoTime()
      tOpen += t1 - t0; tWrite += t2 - t1; tClose += t3 - t2
    }
    sampling = false
    println(f"[scratch]   microbench n=$n rows=${rows.length}: " +
      f"open=${tOpen / 1e9}%.2fs write=${tWrite / 1e9}%.2fs close=${tClose / 1e9}%.2fs")
    Option(exemplar.get).foreach(e => println(s"[scratch]     exemplar stack:\n    $e"))
    import scala.jdk.CollectionConverters._
    hist.asScala.toSeq.sortBy(-_._2).take(12).foreach { case (f, c) =>
      println(s"[scratch]     sample $c  $f")
    }
  }

  /** Write `df` (already clustered by `groupCols` within partitions)
    * under `destDir` as `<gp>=<v>/.../part-<pid>.<ext>` files, one per
    * distinct group-column combination per task. Returns nothing; the
    * caller globs the staged files (same layout as partitionBy). */
  def write(
      spark: org.apache.spark.sql.SparkSession,
      df: DataFrame,
      groupCols: Seq[String],
      destDir: String,
      format: String): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val schema = df.schema
    val groupOrdinals = groupCols.map(schema.fieldIndex)
    groupOrdinals.foreach { i =>
      require(schema(i).dataType == StringType,
        s"group column ${schema(i).name} must be string, got ${schema(i).dataType}")
    }
    val dataFields = schema.fields.zipWithIndex
      .filterNot { case (_, i) => groupOrdinals.contains(i) }
    val dataSchema = StructType(dataFields.map(_._1).toArray)
    val dataOrdinals = dataFields.map(_._2).toArray

    val job = Job.getInstance(classic.sessionState.newHadoopConf())
    val fmt = if (format == "orc") new OrcFileFormat else new ParquetFileFormat
    val factory = fmt.prepareWrite(classic, job, Map.empty, dataSchema)
    val serConf = new SerializableConfiguration(job.getConfiguration)
    val groupNames = groupCols.toArray

    df.queryExecution.toRdd.foreachPartition { rows =>
      if (rows.hasNext) {
        val pid = TaskContext.get().partitionId()
        val attempt = TaskContext.get().taskAttemptId()
        val tac = new TaskAttemptContextImpl(serConf.value,
          new TaskAttemptID(new TaskID(new JobID("graftstage", pid), TaskType.MAP,
            pid), attempt.toInt & Int.MaxValue))
        val ext = factory.getFileExtension(tac)
        val fs = new Path(destDir).getFileSystem(serConf.value)
        val proj = UnsafeProjection.create(
          dataOrdinals.map(i =>
            BoundReference(i, schema(i).dataType, schema(i).nullable)).toSeq)
        var writer: org.apache.spark.sql.execution.datasources.OutputWriter = null
        var tmpPath: Path = null
        var finalPath: Path = null
        val current = new Array[String](groupNames.length)
        var open = false
        def closeCurrent(): Unit = if (writer != null) {
          writer.close(); writer = null
          // per-file write-then-rename: the deterministic final name only
          // ever holds a COMPLETE file (a crashed attempt leaves only
          // .tmp-* junk, removed with the staging dir)
          if (!fs.rename(tmpPath, finalPath)) {
            fs.delete(finalPath, false)
            if (!fs.rename(tmpPath, finalPath))
              throw new java.io.IOException(s"staged rename failed: $tmpPath -> $finalPath")
          }
        }
        try {
          def groupValue(row: org.apache.spark.sql.catalyst.InternalRow, ord: Int): String =
            if (row.isNullAt(ord)) null else row.getUTF8String(ord).toString
          rows.foreach { row =>
            var same = open
            var i = 0
            while (same && i < groupNames.length) {
              if (groupValue(row, groupOrdinals(i)) != current(i)) same = false
              i += 1
            }
            if (!same) {
              closeCurrent()
              var dir = new Path(destDir)
              var j = 0
              while (j < groupNames.length) {
                val v = groupValue(row, groupOrdinals(j))
                current(j) = v
                // same dir-name encoding as DataFrameWriter.partitionBy:
                // null/empty -> the Hive default-partition sentinel
                val seg =
                  if (v == null || v.isEmpty) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
                  else ExternalCatalogUtils.escapePathName(v)
                dir = new Path(dir, s"${groupNames(j)}=$seg")
                j += 1
              }
              fs.mkdirs(dir)
              finalPath = new Path(dir, f"part-$pid%05d$ext")
              tmpPath = new Path(dir, f".tmp-attempt$attempt-part-$pid%05d$ext")
              writer = factory.newInstance(tmpPath.toString, dataSchema, tac)
              open = true
            }
            writer.write(proj(row))
          }
          closeCurrent()
        } catch {
          case t: Throwable =>
            if (writer != null) {
              try writer.close() catch { case _: Throwable => () }
              try fs.delete(tmpPath, false) catch { case _: Throwable => () }
            }
            throw t
        }
      }
    }
  }
}
