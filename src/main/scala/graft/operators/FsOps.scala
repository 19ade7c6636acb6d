package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Checked Hadoop-FS mutations shared by the persisted stores
  * ([[BandIndexStore]], [[IvfIndexStore]]): Hadoop FileSystems report
  * many failures by RETURNING FALSE rather than throwing, and an
  * unchecked false on a commit path converts a transient FS problem
  * into silent data loss (round-10 ADVICE). A false return here aborts
  * the caller mid-protocol, leaving the recovery markers in place for
  * the next entry to retry. Deletes of possibly-absent paths are
  * idempotent: false + gone = success.
  *
  * Filesystem contract shared by both stores: commit points are ATOMIC
  * renames — true on HDFS and local filesystems, NOT on object stores
  * (S3A/GCS emulate rename as copy+delete). Front the store layout
  * with an HDFS-semantics layer there. */
private[operators] object FsOps {

  def fail(what: String): Nothing = throw new java.io.IOException(
    s"store filesystem operation failed (returned false): $what")

  def deleteChecked(f: FileSystem, p: Path): Unit =
    if (!(f.delete(p, true) || !f.exists(p))) fail(s"delete $p")

  def renameChecked(f: FileSystem, src: Path, dst: Path): Unit =
    if (!f.rename(src, dst)) fail(s"rename $src -> $dst")
}
