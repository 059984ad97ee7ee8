package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Merge
import graft.sources.{Dfs, HadoopDfs}

/** The filesystem seam under Merge/Dedup-index: the Hadoop-backed
  * implementation against real file:// paths, and the swap-recovery
  * protocol against an in-memory mock — proving the protocol issues
  * the right calls in the right order without any real filesystem,
  * which is exactly what makes it portable to HDFS/S3. */
class DfsSpec extends AnyFunSuite {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("dfs_spec").toString

  test("HadoopDfs on file://: full surface round-trip") {
    val fs = Dfs.default
    val root = tmp()
    assert(fs.exists(root))
    fs.mkdirs(s"$root/a/b")
    assert(fs.exists(s"$root/a/b"))
    fs.touch(s"$root/a/m.marker")
    assert(fs.exists(s"$root/a/m.marker"))
    assert(fs.listNames(s"$root/a").toSet === Set("b", "m.marker"))
    assert(fs.listDirNames(s"$root/a") === Seq("b"))
    assert(fs.listNames(s"$root/absent") === Seq.empty)
    fs.writeStringAtomic(s"$root/a/v0.tsv", "#nBuckets=4\n1\tx\n")
    assert(fs.readString(s"$root/a/v0.tsv") === "#nBuckets=4\n1\tx\n")
    // atomic publish overwrites in place and leaves no tmp behind
    fs.writeStringAtomic(s"$root/a/v0.tsv", "#nBuckets=8\n")
    assert(fs.readString(s"$root/a/v0.tsv") === "#nBuckets=8\n")
    assert(!fs.exists(s"$root/a/v0.tsv.tmp"))
    fs.rename(s"$root/a/b", s"$root/a/c")
    assert(!fs.exists(s"$root/a/b") && fs.exists(s"$root/a/c"))
    fs.delete(s"$root/a")
    assert(!fs.exists(s"$root/a"))
    fs.delete(s"$root/a") // absent: silent no-op
    // a refused rename must be LOUD, not a false return
    intercept[java.io.IOException](
      fs.rename(s"$root/nope", s"$root/also_nope"))
  }

  /** In-memory mock: a set of directory paths, a set of file paths,
    * and an ordered call log. Enough structure for the swap/manifest
    * protocols, zero real I/O. */
  final class MockDfs extends Dfs {
    val dirs = scala.collection.mutable.Set.empty[String]
    val files = scala.collection.mutable.Map.empty[String, String]
    val log = scala.collection.mutable.ArrayBuffer.empty[String]
    var failRenames = false

    private def children(path: String): Seq[String] = {
      val pre = path.stripSuffix("/") + "/"
      (dirs ++ files.keys).toSeq.collect {
        case p if p.startsWith(pre) && !p.stripPrefix(pre).contains("/") =>
          p.stripPrefix(pre)
      }.distinct.sorted
    }
    override def exists(p: String): Boolean =
      dirs.contains(p) || files.contains(p)
    override def listFileSizes(p: String): Seq[(String, Long)] =
      children(p).filter(c => files.contains(s"${p.stripSuffix("/")}/$c"))
        .map(c => c -> files(s"${p.stripSuffix("/")}/$c").length.toLong)
    override def mkdirs(p: String): Unit = { dirs += p; () }
    override def delete(p: String): Unit = {
      log += s"delete $p"
      val pre = p.stripSuffix("/") + "/"
      dirs.filterInPlace(d => d != p && !d.startsWith(pre))
      files.filterInPlace { case (f, _) => f != p && !f.startsWith(pre) }
    }
    override def rename(src: String, dst: String): Unit = {
      log += s"rename $src -> $dst"
      if (failRenames) throw new java.io.IOException(s"refused: $src")
      val pre = src.stripSuffix("/") + "/"
      val movedDirs = dirs.toSeq.filter(d => d == src || d.startsWith(pre))
      val movedFiles = files.toSeq.filter { case (f, _) =>
        f == src || f.startsWith(pre) }
      if (movedDirs.isEmpty && movedFiles.isEmpty)
        throw new java.io.IOException(s"rename of absent path: $src")
      movedDirs.foreach { d => dirs -= d; dirs += dst + d.stripPrefix(src) }
      movedFiles.foreach { case (f, c) =>
        files -= f; files += (dst + f.stripPrefix(src)) -> c }
    }
    override def listNames(p: String): Seq[String] = children(p)
    override def listDirNames(p: String): Seq[String] = {
      val pre = p.stripSuffix("/") + "/"
      children(p).filter(n => dirs.exists(d =>
        d == pre + n || d.startsWith(pre + n + "/")))
    }
    override def touch(p: String): Unit = { files += p -> ""; () }
    override def readString(p: String): String = files(p)
    override def writeStringAtomic(p: String, c: String): Unit = {
      log += s"publish $p"; files += p -> c; ()
    }
  }

  test("recoverSwap via mock: marker present -> staging wins, bucket dirs move, staging removed") {
    val fs = new MockDfs
    fs.dirs ++= Seq("/t", "/t/_mb=1", "/t_m_staging", "/t_m_staging/_mb=1",
      "/t_m_staging/_mb=3")
    fs.files += "/t_m_staging/_GRAFT_COMPLETE" -> ""
    fs.files += "/t/_mb=1/old.parquet" -> "old"
    fs.files += "/t_m_staging/_mb=1/new.parquet" -> "new"
    Merge.recoverSwap("/t", fs)
    // staged bucket replaced the live one; the extra staged bucket
    // landed; staging is gone
    assert(fs.files("/t/_mb=1/new.parquet") === "new")
    assert(!fs.files.contains("/t/_mb=1/old.parquet"))
    assert(fs.dirs.contains("/t/_mb=3"))
    assert(!fs.exists("/t_m_staging"))
    // per-bucket order: the live bucket is deleted BEFORE its staged
    // replacement moves in (never two copies visible under one name)
    val i1 = fs.log.indexOf("delete /t/_mb=1")
    val i2 = fs.log.indexOf("rename /t_m_staging/_mb=1 -> /t/_mb=1")
    assert(i1 >= 0 && i2 > i1, fs.log.mkString("; "))
  }

  test("recoverSwap via mock: no marker -> aborted staging discarded, live table untouched") {
    val fs = new MockDfs
    fs.dirs ++= Seq("/t", "/t/_mb=1", "/t_m_staging", "/t_m_staging/_mb=1")
    fs.files += "/t/_mb=1/old.parquet" -> "old"
    fs.files += "/t_m_staging/_mb=1/half.parquet" -> "half"
    Merge.recoverSwap("/t", fs)
    assert(fs.files("/t/_mb=1/old.parquet") === "old")
    assert(!fs.exists("/t_m_staging"))
    assert(!fs.log.exists(_.startsWith("rename")), fs.log.mkString("; "))
  }

  test("recoverSwap via mock: refused rename surfaces as IOException (no silent false)") {
    val fs = new MockDfs
    fs.dirs ++= Seq("/t", "/t_m_staging", "/t_m_staging/_mb=2")
    fs.files += "/t_m_staging/_GRAFT_COMPLETE" -> ""
    fs.failRenames = true
    intercept[java.io.IOException](Merge.recoverSwap("/t", fs))
  }

  test("manifest protocol via mock: versions parse what writeStringAtomic published") {
    val fs = new MockDfs
    fs.dirs += "/v"
    // simulate two published manifests plus a torn tmp that must be ignored
    fs.files += "/v/_manifests/v0.tsv" -> "#nBuckets=4\n"
    fs.files += "/v/_manifests/v2.tsv" -> "#nBuckets=4\n"
    fs.files += "/v/_manifests/v1.tsv.tmp" -> "#nBuckets=4\n"
    fs.dirs += "/v/_manifests"
    assert(Merge.versions("/v", fs) === Seq(0, 2))
  }
}
