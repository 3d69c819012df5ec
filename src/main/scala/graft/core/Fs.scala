package graft.core

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Tiny shared filesystem helpers for staging/teardown paths — ONE
  * implementation of recursive temp-dir deletion (StateTable version
  * swaps, streaming replay staging, spec scratch dirs) so stream-closing
  * and traversal fixes reach every caller.
  */
object Fs {

  /** Files.list with the stream closed (it holds a directory fd). */
  def listDir(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator.asScala.toSeq
    finally s.close()
  }

  def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
