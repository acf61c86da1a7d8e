package graft.util

import java.nio.file.{Files, Paths}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

/** Move a fully-written `tmp` file to `dst` EXCLUSIVELY — the commit gate
  * under every manifest publish, checkpoint, and tail marker (round 13).
  *
  * Returns true if THIS caller created `dst`; false if `dst` already
  * existed (the caller lost the race). `tmp` is removed either way.
  *
  * Why two mechanisms: on HDFS-like filesystems `rename(NONE)` is decided
  * atomically on the NameNode — the right gate. On the LOCAL filesystem,
  * Hadoop's `FileContext.rename(.., Rename.NONE)` is CHECK-THEN-ACT
  * (an exists() probe followed by a plain rename(2), which silently
  * overwrites on POSIX): two threads racing the same destination can both
  * pass the probe, the loser's content replaces the winner's, and the
  * checksum sidecar ends up describing the other writer's bytes — a
  * ChecksumException on every subsequent read (observed under an 8-thread
  * commit race). The POSIX primitive that IS atomic-exclusive is
  * link(2): `Files.createLink` fails with EEXIST without ever disturbing
  * an existing destination, so local publishes hard-link the tmp body
  * into place and then drop the tmp name (same inode — no copy). */
object AtomicPublish {
  def apply(fs: FileSystem, conf: Configuration, tmp: Path,
            dst: Path): Boolean = {
    val q = fs.makeQualified(dst)
    if (q.toUri.getScheme == "file") {
      val src = Paths.get(fs.makeQualified(tmp).toUri.getPath)
      val d = Paths.get(q.toUri.getPath)
      try { Files.createLink(d, src); fs.delete(tmp, false); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          fs.delete(tmp, false); false
        // mount without hard-link support (FUSE, CIFS/FAT, some overlay
        // edges) — ADVICE r13: without a fallback every publish bricks.
        // Next-best primitive: open(O_CREAT|O_EXCL), still exclusive —
        // of two racers exactly one creates dst — but the body lands
        // through a write after the create, so a crash mid-write can
        // leave a short dst (the hard-link path can't). ADVICE r14: the
        // write LOOPS until the buffer drains (WritableByteChannel may
        // short-write without error, likeliest on exactly the mounts
        // this branch serves), and manifest bodies end with an `#eof`
        // trailer the readers validate — a dst truncated by a crash
        // between create and the final write fails loudly at read time
        // instead of parsing as a smaller file set.
        case linkless @ (_: UnsupportedOperationException |
                         _: java.nio.file.FileSystemException) =>
          val won =
            try {
              val body = Files.readAllBytes(src)
              val ch = Files.newByteChannel(d,
                java.nio.file.StandardOpenOption.CREATE_NEW,
                java.nio.file.StandardOpenOption.WRITE)
              try {
                val buf = java.nio.ByteBuffer.wrap(body)
                while (buf.hasRemaining) ch.write(buf)
              }
              finally ch.close()
              true
            } catch {
              case _: java.nio.file.FileAlreadyExistsException => false
              case scala.util.control.NonFatal(_) =>
                fs.delete(tmp, false); throw linkless
            }
          fs.delete(tmp, false); won
        case e: Throwable => fs.delete(tmp, false); throw e
      }
    } else {
      val fc = FileContext.getFileContext(q.toUri, conf)
      try { fc.rename(tmp, dst, Options.Rename.NONE); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          fs.delete(tmp, false); false
        case e: Throwable => fs.delete(tmp, false); throw e
      }
    }
  }
}
