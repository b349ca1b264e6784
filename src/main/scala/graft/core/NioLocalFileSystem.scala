package graft.core

import java.nio.file.attribute.PosixFilePermission
import java.util.EnumSet

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem with fork-free permission handling.
  *
  * Without the native Hadoop library (`libhadoop.so` — absent in this
  * environment and in many containerized deployments),
  * `RawLocalFileSystem.setPermission` falls back to
  * `Shell.execCommand("chmod", ...)`: a process FORK PER CREATED FILE
  * (two with the `.crc` twin `ChecksumFileSystem` writes). Stack-sampled
  * at ~75% of staged-write wall time on a 2,000-file commit (~8 ms/file
  * against ~0.3 ms of actual parquet work; see OPTIMIZATION_r12.md) —
  * the publish path's real floor was process-spawn latency, not I/O.
  *
  * This subclass implements the exact same permission change with
  * `java.nio.file.Files.setPosixFilePermissions` — microseconds, no
  * fork, same on-disk result. Wired in via the Hadoop conf key
  * `fs.file.impl` (see [[graft.Tables.configure]]); cluster deployments
  * on HDFS/S3 never instantiate the local scheme on the data path, so
  * this is a correction of local-mode measurement distortion, not a
  * local-only tuning trick.
  */
class NioRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    if (permission == null) return
    val file =
      try pathToFile(p).toPath
      catch {
        // a name the JVM's native charset can't map (non-ASCII under a
        // POSIX locale): java.io.File handles the raw bytes but NIO
        // refuses — fall back to the (forking) stock path for that file
        case _: java.nio.file.InvalidPathException =>
          super.setPermission(p, permission); return
      }
    val bits = permission.toShort.toInt
    val set = EnumSet.noneOf(classOf[PosixFilePermission])
    import PosixFilePermission._
    val order = Seq(OTHERS_EXECUTE, OTHERS_WRITE, OTHERS_READ,
      GROUP_EXECUTE, GROUP_WRITE, GROUP_READ,
      OWNER_EXECUTE, OWNER_WRITE, OWNER_READ)
    order.zipWithIndex.foreach { case (perm, i) =>
      if ((bits & (1 << i)) != 0) set.add(perm)
    }
    try java.nio.file.Files.setPosixFilePermissions(file, set)
    catch {
      case e: java.nio.file.NoSuchFileException =>
        throw new java.io.FileNotFoundException(
          s"setPermission: ${e.getMessage}")
      case _: UnsupportedOperationException =>
        // non-POSIX store: match RawLocalFileSystem's best-effort stance
        super.setPermission(p, permission)
    }
  }
}

/** `file://` scheme implementation = the standard checksummed local FS
  * (same `.crc` behavior, same semantics) over the fork-free raw layer. */
class NioLocalFileSystem extends LocalFileSystem(new NioRawLocalFileSystem)
