package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel bodies for the custom Catalyst expressions.
  *
  * A top-level Scala object with no companion class compiles to
  * static forwarders, so generated Java from `doGenCode` calls these
  * directly (`graft.functions.Kernels.simhash64(arr)`) — the same
  * pattern Spark's own hash expressions use with `XXH64`. One body
  * serves BOTH execution paths: the interpreted `nullSafeEval` and
  * the whole-stage-codegen emission delegate here, so the two paths
  * cannot drift (the hash gates pin the values; this file pins that
  * there is only one implementation to pin).
  */
object Kernels {

  @inline private def hashStr(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  /** Content-defined chunking: split `text` into variable-length
    * token chunks whose boundaries depend only on LOCAL content — a
    * window-w rolling hash over per-token polynomial hashes, with a
    * boundary declared after token i when the window hash divides
    * `div`. Insertions/deletions therefore only perturb boundaries
    * inside one window of the edit; all other chunks keep their
    * identity — the property fixed-stride spans (d_span_dedup) lack.
    *
    * Arithmetic is the oracle-restatable shape (nonnegative mod-1e9+7
    * folds over codepoints, in index order) rather than XXH64: the
    * DuckDB gate recomputes every boundary with list folds, so this
    * kernel is pinned end to end. Empty text → one empty chunk,
    * mirroring `string_split`'s `['']`. */
  def cdcChunks(text: UTF8String, w: Int, div: Int): ArrayData = {
    val P = 1000000007L
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      var acc = 7L
      val it = toks(i).codePoints().iterator()
      while (it.hasNext) acc = (acc * 31 + it.nextInt()) % P
      th(i) = acc
      i += 1
    }
    val ends = scala.collection.mutable.ArrayBuffer.empty[Int]
    i = w // 1-based end position of the first full window
    while (i <= n) {
      var acc = 11L
      var j = i - w
      while (j < i) { acc = (acc * 31 + th(j)) % P; j += 1 }
      if (acc % div == 0) ends += i
      i += 1
    }
    if (ends.isEmpty || ends.last != n) ends += n
    val out = new Array[AnyRef](ends.length)
    var start = 0 // 0-based inclusive
    i = 0
    while (i < ends.length) {
      val e = ends(i) // 1-based inclusive end = 0-based exclusive
      val sb = new java.lang.StringBuilder()
      var j = start
      while (j < e) {
        if (j > start) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      start = e
      i += 1
    }
    new GenericArrayData(out)
  }

  /** SimHash: array<string> tokens → 64-bit signature. */
  def simhash64(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h = hashStr(arr.getUTF8String(j), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  // deterministic odd multipliers / offsets (splitmix-style), cached
  // per permutation count — identical bit-for-bit to the original
  // per-expression lazy table
  private val permCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private def permTable(perms: Int): (Array[Long], Array[Long]) =
    permCache.computeIfAbsent(perms, { p =>
      val a = new Array[Long](p); val b = new Array[Long](p)
      var x = 0x9E3779B97F4A7C15L
      def next(): Long = {
        x += 0x9E3779B97F4A7C15L
        var z = x
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^ (z >>> 31)
      }
      var i = 0
      while (i < p) { a(i) = next() | 1L; b(i) = next(); i += 1 }
      (a, b)
    })

  /** MinHash signature: array<string> shingles → array<long> minima
    * under `perms` affine permutations of one base xxHash. */
  def minhashSig(arr: ArrayData, perms: Int): ArrayData = {
    val (as, bs) = permTable(perms)
    val n = arr.numElements()
    val sig = Array.fill(perms)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = hashStr(arr.getUTF8String(j), 42L)
      var i = 0
      while (i < perms) {
        val p = as(i) * h + bs(i)
        if (p < sig(i)) sig(i) = p
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** Cosine of two EQUAL-LENGTH float vectors (callers check dims —
    * the expression's codegen emits the mismatch→null branch). Same
    * accumulation order as the DuckDB oracle: per-index float→double
    * casts, one sequential fold per accumulator. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Binary-quantization code: array<float> → `words` packed longs of
    * sign-random-projection bits (±1 hyperplanes from the same
    * deterministic (plane, dim) mix as [[HashExpressions.SrpBucket]],
    * offset into a disjoint plane namespace). With words·64 ≥ dim and
    * axis-aligned planes this degenerates to the textbook "sign of
    * each component" BQ; projection expansion matters when dim is
    * SMALL (the 64-dim gate corpus needs 512 projected bits — raw
    * 64-bit sign codes measured a 66%-of-corpus shortlist for
    * recall 1 vs ~10% at 512 bits). */
  // ±1 plane components, (bit, dim)-major, cached per (words, dim):
  // the mix runs once per configuration instead of per ROW (recomputing
  // it per row measured 87 s for the 200k-vector 100× encode sweep —
  // the mix tripled the inner loop). Bounded: one entry per distinct
  // (code width, embedding dim) pair in the process, words·64·dim
  // floats each (512×64 = 128 KB).
  private val srpPlaneCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Float]]()

  private def srpPlanes(words: Int, dim: Int): Array[Float] =
    srpPlaneCache.computeIfAbsent((words.toLong << 32) | dim, { _ =>
      val nbits = words << 6
      val s = new Array[Float](nbits * dim)
      var b = 0
      while (b < nbits) {
        val plane = (1L << 20) + b
        var j = 0
        while (j < dim) {
          var z = plane * 0x9E3779B97F4A7C15L + j * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 30)) * 0x94D049BB133111EBL
          z ^= (z >>> 31)
          s(b * dim + j) = if (z > 0) 1.0f else -1.0f
          j += 1
        }
        b += 1
      }
      s
    })

  def srpPack(a: ArrayData, words: Int): ArrayData = {
    val n = a.numElements()
    val planes = srpPlanes(words, n)
    val out = new Array[Long](words)
    var b = 0
    val nbits = words << 6
    while (b < nbits) {
      var proj = 0.0
      var j = 0
      val off = b * n
      while (j < n) {
        proj += a.getFloat(j).toDouble * planes(off + j)
        j += 1
      }
      if (proj > 0) out(b >>> 6) |= 1L << (b & 63)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Spark SQL's double ordering (NaN greatest, NaN == NaN,
    * -0.0 == 0.0) as a three-way compare — the centroid kernels must
    * replicate the `array_max`-over-structs semantics of the unrolled
    * formulation they replaced bit for bit. */
  @inline private def simCmp(a: Double, b: Double): Int = {
    val an = java.lang.Double.isNaN(a); val bn = java.lang.Double.isNaN(b)
    if (an && bn) 0 else if (an) 1 else if (bn) -1
    else if (a > b) 1 else if (a < b) -1 else 0
  }

  /** All nCells cosine scores of one vector against a flat
    * (cell-major) centroid matrix — the shared body of the two
    * assignment kernels. Identical arithmetic to [[cosine]] (per-index
    * float→double casts, sequential folds); the query norm is hoisted
    * out of the per-centroid loop (same fold over the same floats, so
    * bit-identical, k× cheaper). */
  private def cellScores(v: ArrayData, cents: Array[Float],
                         dim: Int): Array[Double] = {
    val k = cents.length / dim
    var na = 0.0
    var i = 0
    while (i < dim) {
      val x = v.getFloat(i).toDouble
      na += x * x
      i += 1
    }
    val sqna = math.sqrt(na)
    val sims = new Array[Double](k)
    var c = 0
    while (c < k) {
      val off = c * dim
      var dot = 0.0; var nb = 0.0
      i = 0
      while (i < dim) {
        val x = v.getFloat(i).toDouble
        val y = cents(off + i).toDouble
        dot += x * y; nb += y * y
        i += 1
      }
      sims(c) = dot / (sqna * math.sqrt(nb))
      c += 1
    }
    sims
  }

  /** Nearest-centroid cell id: argmax cosine over a CELL-ASCENDING
    * model, ties to the smallest cell (the scan keeps the first
    * best). The model rides the codegen references array — one static
    * call regardless of nCells, where the unrolled-literal
    * formulation hit janino's 64 KB method ceiling at 1024 cells ×
    * dim 64 (PERF_r13) and fell back to interpreted evaluation. */
  def nearestCell(v: ArrayData, cells: Array[Int],
                  cents: Array[Float]): Int = {
    val dim = cents.length / cells.length
    val sims = cellScores(v, cents, dim)
    var best = 0
    var c = 1
    while (c < sims.length) {
      if (simCmp(sims(c), sims(best)) > 0) best = c
      c += 1
    }
    cells(best)
  }

  /** The nProbe nearest cells, best-first (cosine DESC, cell ASC on
    * ties — the ascending scan with strict-greater replacement keeps
    * the smaller cell). O(nCells·nProbe) selection: nProbe is small
    * (4–32) and nCells bounded by the model, so no sort. */
  def topCells(v: ArrayData, cells: Array[Int], cents: Array[Float],
               nProbe: Int): ArrayData = {
    val dim = cents.length / cells.length
    val sims = cellScores(v, cents, dim)
    val k = sims.length
    val m = math.min(nProbe, k)
    val taken = new Array[Boolean](k)
    val out = new Array[Int](m)
    var r = 0
    while (r < m) {
      var bi = -1
      var c = 0
      while (c < k) {
        if (!taken(c) && (bi < 0 || simCmp(sims(c), sims(bi)) > 0)) bi = c
        c += 1
      }
      taken(bi) = true
      out(r) = cells(bi)
      r += 1
    }
    new GenericArrayData(out)
  }

  /** Hamming distance between two EQUAL-LENGTH packed sign codes
    * (callers check word counts — the expression emits the
    * mismatch→null branch). */
  def hamming(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    var d = 0
    var i = 0
    while (i < n) {
      d += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    d
  }
}
