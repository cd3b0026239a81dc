package graft.sources

import org.apache.spark.sql.SparkSession

/** Shared helpers for warehouse-managed derived tables (the bucketed
  * join copies, the aggregate summaries): naming, stale-location
  * cleanup, and a cheap content tag of the source parquet so a derived
  * table can detect that its base was regenerated underneath it.
  */
object Warehouse {

  /** Filesystem-safe tag of a corpus dir for derived-table names. */
  def dirTag(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9]", "_").toLowerCase

  /** The managed location of table `name` under the session warehouse. */
  def location(s: SparkSession, name: String): java.io.File =
    new java.io.File(
      new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath, name)

  /** Recursively delete a stale managed location: a fresh session
    * catalog cannot adopt a previous JVM's managed directory (metadata
    * lives in the catalog, not the files) and saveAsTable refuses to
    * reuse it — derived tables drop the orphan and rebuild. */
  def dropStaleLocation(s: SparkSession, name: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    val loc = location(s, name)
    if (loc.exists()) rm(loc)
  }

  /** md5 over every data file's (name, length, footer tail) — the same
    * content key IvfPqIndex uses: reading the last 64 KiB keeps this
    * O(#files) at any size, and the parquet footer's row-group
    * statistics move whenever the data does. Lets a derived table
    * detect a regenerated base even at identical byte length and mtime. */
  def contentTag(src: java.io.File): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(src.getAbsolutePath.getBytes("UTF-8"))
    val files =
      if (src.isDirectory)
        src.listFiles().filter(f => f.isFile && !f.getName.startsWith("_"))
          .sortBy(_.getName)
      else Array(src)
    files.foreach { f =>
      md.update(s"${f.getName}:${f.length}:".getBytes("UTF-8"))
      val in = new java.io.RandomAccessFile(f, "r")
      try {
        val n = math.min(f.length, 65536L)
        in.seek(f.length - n)
        val buf = new Array[Byte](n.toInt)
        in.readFully(buf)
        md.update(buf)
      } finally in.close()
    }
    md.digest.map("%02x".format(_)).mkString
  }

  /** True when the recorded source tag for `name` matches the current
    * content of `src`; records the current tag when asked. The tag file
    * lives BESIDE the managed location (not inside it) so a table
    * rebuild can't orphan it. */
  def sourceTagCurrent(s: SparkSession, name: String,
                      src: java.io.File): Boolean = {
    val f = tagFile(s, name)
    f.exists() &&
      (try java.nio.file.Files.readString(f.toPath) == contentTag(src)
       catch { case _: java.io.IOException => false })
  }

  def recordSourceTag(s: SparkSession, name: String,
                      src: java.io.File): Unit =
    java.nio.file.Files.writeString(tagFile(s, name).toPath,
      contentTag(src)): Unit

  private def tagFile(s: SparkSession, name: String): java.io.File =
    new java.io.File(location(s, name).getPath + ".__src__")
}
