package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** The two-appendix commit protocol shared by [[IndexedCorpus]] and
  * [[IndexedVectorCorpus]]: a `_COMMITTED` manifest holding the fence
  * (`lastBatchId`) on the first line and one committed batch id per
  * following line, swapped atomically via rename. Data dirs written
  * before the swap are invisible orphans until (and unless) their batch
  * id lands in the manifest. */
private[streaming] object BatchManifest {

  /** (fence, committed batch ids); (-1, Nil) when no manifest exists. */
  def read(fs: FileSystem, pointer: HPath): (Long, Seq[Long]) =
    if (fs.exists(pointer)) {
      val in = fs.open(pointer)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                 finally in.close()
      val lines = text.linesIterator.filter(_.nonEmpty).toSeq
      (lines.head.trim.toLong, lines.tail.map(_.trim.toLong))
    } else (-1L, Nil)

  /** Atomic swap: write `_COMMITTED.tmp<last>` then rename over the
    * pointer with `Rename.OVERWRITE` (atomic on HDFS and posix). The
    * plain `FileSystem.rename` + delete-then-rename fallback is kept
    * only for filesystems without FileContext support — there a crash
    * between the delete and the rename leaves NO manifest (fence reset,
    * every committed batch orphaned), which is why the overwrite form
    * is tried first. */
  def write(fs: FileSystem, root: String, pointer: HPath, last: Long,
            ids: Seq[Long]): Unit = {
    val tmp = new HPath(root, s"_COMMITTED.tmp$last")
    val out = fs.create(tmp, true)
    try out.write((last.toString +: ids.map(_.toString))
      .mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        fs.getUri, fs.getConf)
      fc.rename(tmp, pointer, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: UnsupportedOperationException =>
        if (!fs.rename(tmp, pointer)) {
          fs.delete(pointer, false)
          require(fs.rename(tmp, pointer), s"manifest swap failed for $root")
        }
    }
  }
}
