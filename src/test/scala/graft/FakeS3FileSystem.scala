package graft

import java.net.URI

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local-disk FileSystem masquerading as `s3a://` — lets the spec
  * exercise SnapshotCommit's object-store paths (RenameCommit scheme
  * refusal; PutIfAbsentCommit create-if-absent publication) without a
  * real object store. Instantiated by Hadoop via reflection from the
  * `fs.s3a.impl` conf key.
  *
  * Statuses are MATERIALIZED (permissions resolved eagerly): the
  * parent's DeprecatedRawLocalFileStatus resolves permissions lazily
  * via `new File(path.toUri)`, which rejects any non-`file:` scheme. */
class FakeS3FileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("s3a:///")
  override def getScheme: String = "s3a"

  private def materialize(s: FileStatus): FileStatus =
    new FileStatus(s.getLen, s.isDirectory, s.getReplication, s.getBlockSize,
      s.getModificationTime, s.getAccessTime,
      if (s.isDirectory) FsPermission.getDirDefault else FsPermission.getFileDefault,
      "test", "test", s.getPath)

  override def getFileStatus(f: Path): FileStatus =
    materialize(super.getFileStatus(f))

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(materialize)
}
