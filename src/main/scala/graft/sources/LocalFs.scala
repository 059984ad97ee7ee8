package graft.sources

/** Local-filesystem helpers shared by the table-layout operators
  * (Merge swap/vacuum, Dedup index bootstrap). On HDFS/object stores
  * these calls go through the FileSystem API instead; the protocols
  * above them are unchanged. */
object LocalFs {
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(); ()
  }
}
