package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled kernels for the sketch/similarity hot paths.
  *
  * Spark's higher-order array functions (transform/aggregate/zip_with)
  * evaluate their lambdas INTERPRETED, per element — a 64-permutation
  * MinHash written as nested transforms costs ~2 µs per (perm,
  * shingle) pair, which at sf0.1 was 200+ s of the whole bench. These
  * expressions do one eval per ROW with a primitive loop inside:
  * same semantics, 100-1000× less overhead, and they compose with the
  * rest of the (codegen'd) plan. This is preference order (b) of the
  * custom-operator ladder: an Expression, not a UDF — no SerDe, null
  * handling from UnaryExpression, registry-resolvable for SQL.
  */
object HashExpressions {

  /** 64-bit xxHash of one UTF8String with seed. */
  @inline private def hashStr(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  /** MinHash signature: array<string> shingles → array<long> of
    * `perms` minima. Permutation i applies the affine multiply-add
    * (a_i * h + b_i mod 2^64) to the base xxHash of each shingle —
    * one string hash per shingle total, then cheap long ops.
    * Codegen-native (doGenCode emits a static [[Kernels]] call), so
    * the enclosing projection stays one WholeStageCodegen span. */
  case class MinHashSignature(child: Expression, perms: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullSafeEval(v: Any): Any =
      Kernels.minhashSig(v.asInstanceOf[ArrayData], perms)
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.Kernels.minhashSig($c, $perms)")
    override protected def withNewChildInternal(c: Expression): MinHashSignature =
      copy(child = c)
    override def prettyName: String = "minhash_signature"
  }

  /** SimHash: array<string> tokens → 64-bit signature long.
    * Codegen-native via the static [[Kernels]] body. */
  case class SimHash64(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      java.lang.Long.valueOf(Kernels.simhash64(v.asInstanceOf[ArrayData]))
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
      defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.simhash64($c)")
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
    override def prettyName: String = "simhash64"
  }

  /** Cosine similarity of two float vectors, computed EXACTLY like
    * the DuckDB-oracle formulation: per-index float→double casts, one
    * sequential left-fold per accumulator — bit-identical results.
    * Codegen-native; the dimension-mismatch→null branch (SQL-style,
    * not an executor crash) is emitted inline, the arithmetic is the
    * shared static [[Kernels]] body. */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      if (a.numElements() != b.numElements()) null
      else java.lang.Double.valueOf(Kernels.cosine(a, b))
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = graft.functions.Kernels.cosine($a, $b);
        }""")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def prettyName: String = "cosine_similarity"
  }

  /** Binary-quantization code: array<float> → `words` packed longs of
    * deterministic SRP sign bits ([[Kernels.srpPack]]).
    * Codegen-native via the static kernel body. */
  case class SrpPack(child: Expression, words: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      Kernels.srpPack(v.asInstanceOf[ArrayData], words)
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
      defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.srpPack($c, $words)")
    override protected def withNewChildInternal(c: Expression): SrpPack =
      copy(child = c)
    override def prettyName: String = "srp_pack"
  }

  /** Content-defined chunking of a document into token chunks —
    * codegen-native wrapper over [[Kernels.cdcChunks]]. */
  case class CdcChunks(child: Expression, w: Int, div: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      Kernels.cdcChunks(v.asInstanceOf[UTF8String], w, div)
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
      defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.cdcChunks($c, $w, $div)")
    override protected def withNewChildInternal(c: Expression): CdcChunks =
      copy(child = c)
    override def prettyName: String = "cdc_chunks"
  }

  /** Hamming distance of two packed sign codes (array<long>); word
    * count mismatch → null, SQL-style, like [[CosineSimilarity]]. */
  case class HammingDist(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      if (a.numElements() != b.numElements()) null
      else java.lang.Integer.valueOf(Kernels.hamming(a, b))
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = graft.functions.Kernels.hamming($a, $b);
        }""")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def prettyName: String = "hamming_dist"
  }

  /** PQ code assignment: embedding array<float> → array<int> of
    * `nSub` argmin-L2 codes against a codebook held inside the
    * expression as one flat float array ((m, code)-major, subDim
    * floats each). One primitive loop per row replaces the nSub×k
    * unrolled interpreted aggregate-lambda expressions the first
    * formulation built (~40× on the encode scan at 8×64 books).
    * Same arithmetic as that formulation: float subtract/multiply,
    * double accumulate; ties keep the smaller code (strict <).
    * Dimension mismatch → null (SQL-style), like [[CosineSimilarity]]. */
  case class PqCodes(child: Expression, books: Array[Float],
                     nSub: Int, k: Int)
      extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    private val subDim = books.length / (nSub * k)

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      if (a.numElements() != nSub * subDim) return null
      val codes = new Array[Int](nSub)
      var m = 0
      while (m < nSub) {
        val voff = m * subDim
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          val boff = (m * k + c) * subDim
          var d = 0.0
          var i = 0
          while (i < subDim) {
            val diff = a.getFloat(voff + i) - books(boff + i)
            d += diff * diff
            i += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        codes(m) = best
        m += 1
      }
      new GenericArrayData(codes)
    }
    override protected def withNewChildInternal(c: Expression): PqCodes =
      copy(child = c)
    override def prettyName: String = "pq_codes"
  }

  /** PQ reconstruction residual: embedding array<float> → the L2
    * distance ‖x − x̂‖ between a vector and its product-quantized
    * reconstruction (the same argmin loop as [[PqCodes]], but the
    * output is the accumulated min distance instead of the codes).
    * This is the quantity the margin-derived ADC shortlist needs:
    * |dot(q, x̂) − dot(q, x)| ≤ ‖q‖·‖x − x̂‖ by Cauchy–Schwarz, so the
    * residual bounds how far a code-domain score can sit from the
    * true score — the shortlist becomes an interval-overlap cover
    * with recall 1 by construction instead of a guessed fraction of
    * the corpus. Same arithmetic discipline as PqCodes: float
    * subtract/multiply, double accumulate. Dimension mismatch → null. */
  case class PqResidual(child: Expression, books: Array[Float],
                        nSub: Int, k: Int)
      extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    private val subDim = books.length / (nSub * k)

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      if (a.numElements() != nSub * subDim) return null
      var total = 0.0
      var m = 0
      while (m < nSub) {
        val voff = m * subDim
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          val boff = (m * k + c) * subDim
          var d = 0.0
          var i = 0
          while (i < subDim) {
            val diff = a.getFloat(voff + i) - books(boff + i)
            d += diff * diff
            i += 1
          }
          if (d < bestD) bestD = d
          c += 1
        }
        total += bestD
        m += 1
      }
      java.lang.Double.valueOf(math.sqrt(total))
    }
    override protected def withNewChildInternal(c: Expression): PqResidual =
      copy(child = c)
    override def prettyName: String = "pq_residual"
  }

  /** Nearest-centroid assignment: embedding array<float> → the cell
    * id (from a CELL-ASCENDING model) with the highest cosine, ties
    * to the smallest cell. The centroid matrix is held inside the
    * expression and emitted into generated code via the REFERENCES
    * array (`ctx.addReferenceObj`), so the generated method is one
    * static [[Kernels.nearestCell]] call of CONSTANT size — the
    * unrolled-literal formulation this replaces grew the generated
    * method linearly in nCells and overflowed janino's 64 KB limit
    * at 1024 cells × dim 64 (PERF_r13), silently dropping the whole
    * stage to interpreted evaluation. Dimension mismatch → null. */
  case class NearestCell(child: Expression, cells: Array[Int],
                         cents: Array[Float])
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    private val dim = cents.length / cells.length
    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      if (a.numElements() != dim) null
      else java.lang.Integer.valueOf(Kernels.nearestCell(a, cells, cents))
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
      val cellsRef = ctx.addReferenceObj("cells", cells, "int[]")
      val centsRef = ctx.addReferenceObj("cents", cents, "float[]")
      nullSafeCodeGen(ctx, ev, c => s"""
        if ($c.numElements() != $dim) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = graft.functions.Kernels.nearestCell($c, $cellsRef, $centsRef);
        }""")
    }
    override protected def withNewChildInternal(c: Expression): NearestCell =
      copy(child = c)
    override def prettyName: String = "nearest_cell"
  }

  /** The nProbe nearest cells of a query vector, best-first (cosine
    * DESC, cell ASC) — same reference-object model embedding as
    * [[NearestCell]], same constant generated-code size. Dimension
    * mismatch → null. */
  case class TopCells(child: Expression, cells: Array[Int],
                      cents: Array[Float], nProbe: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = true
    private val dim = cents.length / cells.length
    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      if (a.numElements() != dim) null
      else Kernels.topCells(a, cells, cents, nProbe)
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
      val cellsRef = ctx.addReferenceObj("cells", cells, "int[]")
      val centsRef = ctx.addReferenceObj("cents", cents, "float[]")
      nullSafeCodeGen(ctx, ev, c => s"""
        if ($c.numElements() != $dim) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = graft.functions.Kernels.topCells($c, $cellsRef, $centsRef, $nProbe);
        }""")
    }
    override protected def withNewChildInternal(c: Expression): TopCells =
      copy(child = c)
    override def prettyName: String = "top_cells"
  }

  /** Morton/Z-order interleave of the low `bits` of two non-negative
    * longs: x occupies even bit positions, y odd. Sorting by the
    * z-value clusters rows that are close in BOTH dimensions — the
    * multi-column data-skipping layout ([[graft.operators.Layout]]
    * writes it; parquet footer min/max then prune on either column).
    * Negative inputs are masked like any other value (callers bucket/
    * offset first — documented at the Layout call site). */
  case class ZOrder2(left: Expression, right: Expression, bits: Int)
      extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
    override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
    override def dataType: DataType = LongType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val mask = (1L << bits) - 1
      val a = l.asInstanceOf[Long] & mask
      val b = r.asInstanceOf[Long] & mask
      var z = 0L; var i = 0
      while (i < bits) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
        i += 1
      }
      java.lang.Long.valueOf(z)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def prettyName: String = "z_order_2"
  }

  /** N-column Morton interleave: bit j of column c lands at position
    * j*N + c, so sorting by the z-value tiles ALL N dimensions at
    * once (the 2-column [[ZOrder2]] is the N=2 special case with the
    * same bit placement). `bits * N` must fit 63 — callers take
    * bits = 63/N, the widest per-dimension domain a single long key
    * admits. Any null input → null. */
  case class ZOrderN(children: Seq[Expression], bits: Int)
      extends Expression with ImplicitCastInputTypes with CodegenFallback {
    require(children.nonEmpty, "z_order_n needs at least one column")
    require(bits * children.length <= 63,
      s"z-order overflow: $bits bits x ${children.length} columns")
    override def inputTypes: Seq[DataType] =
      Seq.fill(children.length)(LongType)
    override def dataType: DataType = LongType
    override def nullable: Boolean = children.exists(_.nullable)
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val n = children.length
      val mask = (1L << bits) - 1
      var z = 0L
      var c = 0
      while (c < n) {
        val v = children(c).eval(input)
        if (v == null) return null
        val a = v.asInstanceOf[Long] & mask
        var i = 0
        while (i < bits) {
          z |= ((a >> i) & 1L) << (i * n + c)
          i += 1
        }
        c += 1
      }
      java.lang.Long.valueOf(z)
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): ZOrderN =
      copy(children = newChildren)
    override def prettyName: String = "z_order_n"
  }

  /** Sign-random-projection LSH bucket: float vector → `bits`-bit
    * bucket for hash table `table` (hyperplane components ±1 from a
    * splitmix of (plane, dim) — matches Similarity.srpBucket's
    * xxhash64-sign contract in spirit; compiled loop in practice). */
  case class SrpBucket(child: Expression, bits: Int, table: Int)
      extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      var bucket = 0L
      var h = 0
      while (h < bits) {
        val plane = table * bits + h
        var proj = 0.0
        var j = 0
        while (j < n) {
          // deterministic ±1 from a mix of (plane, j)
          var z = plane.toLong * 0x9E3779B97F4A7C15L + j * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 30)) * 0x94D049BB133111EBL
          z ^= (z >>> 31)
          proj += a.getFloat(j).toDouble * (if (z > 0) 1.0 else -1.0)
          j += 1
        }
        if (proj > 0) bucket |= (1L << h)
        h += 1
      }
      java.lang.Long.valueOf(bucket)
    }
    override protected def withNewChildInternal(c: Expression): SrpBucket = copy(c)
    override def prettyName: String = "srp_bucket"
  }

  /** splitmix64(seed) mapped to a uniform double in [-1, 1) — the
    * deterministic noise source for synthetic gate fixtures
    * ([[graft.operators.Similarity.clusteredCorpus]]). Closed form
    * per seed (Steele et al.'s SplitMix64 finalizer): no state, no
    * RNG object, so generation distributes over a range scan and
    * replays identically on any cluster topology. Plain JVM Long
    * arithmetic (wrapping), immune to ANSI-mode overflow checks. */
  case class SplitMixUnif(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
    override def inputTypes: Seq[DataType] = Seq(LongType)
    override def dataType: DataType = DoubleType
    override def nullSafeEval(v: Any): Any = {
      var x = v.asInstanceOf[Long] + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^= (x >>> 31)
      java.lang.Double.valueOf((x >>> 11).toDouble / (1L << 53) * 2 - 1)
    }
    override protected def withNewChildInternal(c: Expression): SplitMixUnif =
      copy(c)
    override def prettyName: String = "splitmix_unif"
  }

  /** Bloom-filter membership probe over a long column, the filter a
    * PLAN-TIME constant (serialized `org.apache.spark.util.sketch
    * .BloomFilter` bytes baked into the expression): rows whose key
    * cannot be in the build side drop at the SCAN, before any window/
    * join machinery. Deserialized once per executor instance (lazy),
    * evaluated as one xxhash-based probe per row. False positives
    * only pass extra rows to the exact join behind it — never wrong
    * results. */
  case class BloomMightContainLong(child: Expression, filterBytes: Array[Byte])
      extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
    override def inputTypes: Seq[DataType] = Seq(LongType)
    override def dataType: DataType = BooleanType
    @transient private lazy val bf =
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(filterBytes))
    override def nullSafeEval(v: Any): Any =
      java.lang.Boolean.valueOf(bf.mightContainLong(v.asInstanceOf[Long]))
    override protected def withNewChildInternal(c: Expression): BloomMightContainLong =
      copy(child = c)
    override def prettyName: String = "bloom_might_contain_long"
  }

  /** Distributed long-key bloom-filter build as an AGGREGATE: every
    * element of each row's `array<long>` input is inserted; the result
    * is the serialized sketch BloomFilter that
    * [[BloomMightContainLong]] probes. Running it inside `observe()`
    * on a snapshot WRITE builds the filter during the job that
    * materializes the rows — the incremental-dedup probe path then
    * spends zero extra jobs on count/aggregate before the scan.
    * `numBits` is fixed up front (no pre-count pass): expected
    * insertions are declared as numBits/10, pinning the hash count at
    * ~7 regardless of actual load, and an UNDERfilled bloom only has a
    * lower false-positive rate. Size numBits ≥ ~10× the expected key
    * count; overflowing it degrades the FP rate gracefully (extra
    * buckets pass to the exact join — never wrong results). */
  case class BloomLongsAgg(child: Expression, numBits: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[org.apache.spark.util.sketch.BloomFilter]
      with ImplicitCastInputTypes {
    require(numBits > 0, s"bloom_longs_agg needs numBits > 0, got $numBits")
    override def children: Seq[Expression] = Seq(child)
    override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def createAggregationBuffer(): org.apache.spark.util.sketch.BloomFilter =
      org.apache.spark.util.sketch.BloomFilter.create(
        math.max(1L, numBits / 10L), numBits.toLong)

    override def update(buf: org.apache.spark.util.sketch.BloomFilter,
                        input: InternalRow): org.apache.spark.util.sketch.BloomFilter = {
      val v = child.eval(input)
      if (v != null) {
        val arr = v.asInstanceOf[ArrayData]
        var i = 0
        while (i < arr.numElements()) {
          if (!arr.isNullAt(i)) buf.putLong(arr.getLong(i))
          i += 1
        }
      }
      buf
    }

    override def merge(buf: org.apache.spark.util.sketch.BloomFilter,
                       other: org.apache.spark.util.sketch.BloomFilter): org.apache.spark.util.sketch.BloomFilter = {
      buf.mergeInPlace(other); buf
    }

    override def eval(buf: org.apache.spark.util.sketch.BloomFilter): Any =
      serialize(buf)

    override def serialize(buf: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      buf.writeTo(bos); bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): org.apache.spark.util.sketch.BloomFilter =
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bytes))

    override def withNewMutableAggBufferOffset(o: Int): BloomLongsAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BloomLongsAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): BloomLongsAgg =
      copy(child = newChildren.head)
    override def prettyName: String = "bloom_longs_agg"
  }

  /** Fraction of equal positions in two long signatures (MinHash
    * Jaccard estimate). */
  case class SigAgreement(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      // signature length mismatch → null, not an executor crash
      if (a.numElements() != b.numElements()) return null
      val n = a.numElements()
      var eq = 0
      var i = 0
      while (i < n) { if (a.getLong(i) == b.getLong(i)) eq += 1; i += 1 }
      java.lang.Double.valueOf(eq.toDouble / n)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def prettyName: String = "sig_agreement"
  }

  /** Word n-gram shingles: array<string> tokens → array<string> of
    * space-joined n-token windows, built in one compiled pass (the
    * transform+element_at+concat_ws formulation evaluates interpreted
    * per window — the dominant cost of the shingling stage). */
  case class WordNgrams(child: Expression, n: Int)
      extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val len = arr.numElements()
      if (len < n) new GenericArrayData(Array.empty[Any])
      else {
        val out = new Array[Any](len - n + 1)
        var i = 0
        while (i <= len - n) {
          val parts = new Array[UTF8String](2 * n - 1)
          var j = 0
          while (j < n) {
            if (j > 0) parts(2 * j - 1) = UTF8String.fromString(" ")
            parts(2 * j) = arr.getUTF8String(i + j)
            j += 1
          }
          out(i) = UTF8String.concat(parts: _*)
          i += 1
        }
        new GenericArrayData(out)
      }
    }
    override protected def withNewChildInternal(c: Expression): WordNgrams =
      copy(child = c)
    override def prettyName: String = "word_ngrams"
  }

  /** Register all kernels; Column helpers resolve through the
    * registry (the Column↔Expression bridge is private in Spark 4).
    * Delegates to the shared name→builder table so this path and the
    * [[graft.GraftExtensions]] injector cannot drift. */
  def register(spark: SparkSession): Unit = GraftRegistry.register(spark)

  def minhash_signature(c: Column): Column = call_function("minhash_signature", c)
  def simhash64(c: Column): Column = call_function("simhash64", c)
  def cosine_similarity(a: Column, b: Column): Column =
    call_function("cosine_similarity", a, b)
  def srp_pack(c: Column, words: Int): Column =
    call_function("srp_pack", c, org.apache.spark.sql.functions.lit(words))
  def hamming_dist(a: Column, b: Column): Column =
    call_function("hamming_dist", a, b)
  def cdc_chunks(c: Column, w: Int, div: Int): Column =
    call_function("cdc_chunks", c,
      org.apache.spark.sql.functions.lit(w),
      org.apache.spark.sql.functions.lit(div))
  def sig_agreement(a: Column, b: Column): Column =
    call_function("sig_agreement", a, b)
  def word_ngrams3(c: Column): Column = call_function("word_ngrams_3", c)
  def word_ngrams2(c: Column): Column = call_function("word_ngrams_2", c)
  def z_order16(a: Column, b: Column): Column =
    call_function("z_order_16", a, b)
  def z_orderN(cols: Seq[Column]): Column =
    call_function("z_order_n", cols: _*)
  def top_k_by_score(score: Column, id: Column, k: Int): Column =
    call_function("top_k_by_score", score, id,
      org.apache.spark.sql.functions.lit(k))
  def bloom_might_contain_long(key: Column, filterBytes: Array[Byte]): Column =
    call_function("bloom_might_contain_long", key,
      org.apache.spark.sql.functions.lit(filterBytes))
  def bloom_longs_agg(keys: Column, numBits: Int): Column =
    call_function("bloom_longs_agg", keys,
      org.apache.spark.sql.functions.lit(numBits))
  def kmv_longs_agg(hash: Column, k: Int): Column =
    call_function("kmv_longs_agg", hash,
      org.apache.spark.sql.functions.lit(k))
  def pq_codes(vec: Column, books: Array[Float], nSub: Int, k: Int): Column =
    call_function("pq_codes", vec,
      org.apache.spark.sql.functions.typedLit(books.toSeq),
      org.apache.spark.sql.functions.lit(nSub),
      org.apache.spark.sql.functions.lit(k))
  def pq_residual(vec: Column, books: Array[Float], nSub: Int, k: Int): Column =
    call_function("pq_residual", vec,
      org.apache.spark.sql.functions.typedLit(books.toSeq),
      org.apache.spark.sql.functions.lit(nSub),
      org.apache.spark.sql.functions.lit(k))
  def nearest_cell(vec: Column, cells: Array[Int],
                   cents: Array[Float]): Column =
    call_function("nearest_cell", vec,
      org.apache.spark.sql.functions.typedLit(cells.toSeq),
      org.apache.spark.sql.functions.typedLit(cents.toSeq))
  def top_cells(vec: Column, cells: Array[Int], cents: Array[Float],
                nProbe: Int): Column =
    call_function("top_cells", vec,
      org.apache.spark.sql.functions.typedLit(cells.toSeq),
      org.apache.spark.sql.functions.typedLit(cents.toSeq),
      org.apache.spark.sql.functions.lit(nProbe))

  /** srp_bucket carries per-call (bits, table) statics — register a
    * closure per configuration. */
  def registerSrp(spark: SparkSession, bits: Int, tables: Int): Unit = {
    val reg = spark.sessionState.functionRegistry
    (0 until tables).foreach { t =>
      reg.createOrReplaceTempFunction(s"srp_bucket_${bits}_$t",
        exprs => SrpBucket(exprs.head, bits, t), "built-in")
    }
  }
  def srp_bucket(c: Column, bits: Int, table: Int): Column =
    call_function(s"srp_bucket_${bits}_$table", c)
  def splitmix_unif(seed: Column): Column =
    call_function("splitmix_unif", seed)
}
