package graft.core

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.Path

/** A serialized snapshot at an instant: the folded file-group state of
  * every completed data instant ≤ `asOf`, plus the table schema at that
  * point. Lives under `.graft/checkpoint/<asOf>.json`.
  *
  * Two jobs (reference analogs):
  *  - O(1) snapshot load: resolution replays only instants AFTER the
  *    newest checkpoint instead of the whole timeline — the role the
  *    reference's metadata table plays (HoodieTableMetadata.java:92),
  *    done Delta-checkpoint-style since our commit metadata already
  *    carries complete file lists.
  *  - archiving enabler: instants folded into a checkpoint can leave
  *    the active timeline (HoodieTimelineArchiveLog.java:74) without
  *    losing snapshot reconstructability.
  */
case class SnapshotCheckpoint(
    asOf: String,
    schemaJson: String,
    slices: Seq[FileSlice])

object Checkpoint {
  val Dir = "checkpoint"
  private val Keep = 3 // retained checkpoint generations

  private def dir(timeline: Timeline): Path = new Path(timeline.metaDir, Dir)

  def times(timeline: Timeline): Seq[String] = {
    val fs = timeline.fileSystem
    val d = dir(timeline)
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".json")).map(_.stripSuffix(".json")).sorted
  }

  def write(timeline: Timeline, cp: SnapshotCheckpoint): Unit = {
    val fs = timeline.fileSystem
    val d = dir(timeline)
    fs.mkdirs(d)
    timeline.commitStore.putAtomic(fs, new Path(d, s"${cp.asOf}.json"),
      Json.write(cp))
    // bounded retention: drop all but the newest Keep generations
    times(timeline).dropRight(Keep).foreach { t =>
      fs.delete(new Path(d, s"$t.json"), false)
    }
  }

  def read(timeline: Timeline, time: String): SnapshotCheckpoint = {
    val fs = timeline.fileSystem
    val in = fs.open(new Path(dir(timeline), s"$time.json"))
    val s = try new String(org.apache.commons.io.IOUtils.toByteArray(in),
      StandardCharsets.UTF_8) finally in.close()
    Json.read(s, classOf[SnapshotCheckpoint])
  }

  /** Newest checkpoint usable for a read at `asOf` (None = latest). */
  def latestAtOrBefore(timeline: Timeline, asOf: Option[String]): Option[SnapshotCheckpoint] = {
    val usable = asOf match {
      case Some(t) => times(timeline).filter(_ <= t)
      case None    => times(timeline)
    }
    usable.lastOption.map(read(timeline, _))
  }
}
